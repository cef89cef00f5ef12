"""Sweep-based embedding gather as a Pallas TPU kernel.

Why: XLA's row gather on TPU is per-row op-bound, not bandwidth-bound —
measured (bench/profile_gather3.py, v5e): 4.10ms for 213k rows from a
[2.6M, 17] bf16 table and 4.18ms from the f32 master (2x the bytes, same
time, ~19ns/row), while the sectored-HBM roofline for the same access
pattern is ~0.1-0.3ms. This was the single largest line of the train step
(VERDICT.md round 1, item 1). The reference hits the same access pattern in
BigDL's LookupTable.forward (SURVEY.md §3.2); SparseCore is the hardware
answer — this kernel is the TensorCore one.

Design ("sorted sweep", the gather-side dual of pallas_update's CSR sweep):
  1. ids arrive SORTED (ascending, duplicates fine) — the train step sorts
     once (`sort_key_val`, 0.24ms at 213k) and XLA CSE shares the plan with
     the sorted-scatter update kernel, which needs the same order;
  2. the sorted stream is cut into static position-chunks of ``tp``; chunk
     k's ids span a CONTIGUOUS row range, so it needs only the table tiles
     covering [ids[k*tp] // tr, ids[(k+1)*tp - 1] // tr] — for uniform
     hashed ids that is ~R/(n_chunks*tr) tiles, and across all chunks the
     kernel reads each tile at most once plus one boundary tile per chunk:
     a SEQUENTIAL full-table sweep at HBM streaming bandwidth (~190MB ≈
     0.25ms at the flagship shape) instead of 213k random row reads;
  3. grid = one program per chunk. The chunk's tiles are DMA'd HBM→VMEM
     through a ``NBUF``-deep rotating buffer (DMAs issued ``NBUF-1`` ahead,
     so the tile loop runs at bandwidth, not at DMA round-trip latency);
  4. each (chunk, tile) pair expands ids into a [tile_rows, tp] one-hot via
     iota-compare and contracts it with the tile on the MXU — the same
     known-good Mosaic pattern as pallas_update, run in the opposite
     direction (table -> rows instead of grads -> table);
  5. the table arrives PACKED as [n_tiles, d, tr] (see ``pack``): tile t is
     ``packed[t]``, a full-dims slice, so the manual DMA is tiling-aligned
     for ANY d (Mosaic rejects partial sublane slices like [17, tr] of a
     [17, R] view — sublane dim must be a multiple of 8 or the full dim).
     Packed is also what the update kernel sweeps, so the master table
     lives in kernel-native layout end to end and XLA inserts no transposes.

The kernel emits bf16 rows [N, d] row-major — exactly the layout the
fused-row models consume. The one-hot dot selects single rows (each output
position matches exactly one row of one tile), so the bf16 output is the
exact f32→bf16 cast of the row, and cross-tile accumulation in bf16 is
exact (all other contributions are 0.0).

This replaces the bf16 "shadow" replica that round 1 maintained for fast
XLA gathers: the sweep reads the f32 master directly, so the update kernel
no longer regenerates a [R, D] row-major shadow every step and table memory
halves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 1024  # table rows per tile — must equal pallas_update.TR (shared layout)
TP = 512  # sorted-id positions per chunk (output block height). With the
# factored one-hot, bigger chunks win back (fewer boundary tiles/DMAs):
# measured on v5e at the flagship shape: 1.52ms (tp=512) vs 1.60 (256) vs
# 1.95 (128); the pre-factoring kernel was 3.99ms
NBUF = 8  # tile DMA pipeline depth (hides HBM latency in the tile loop)

_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


# ------------------------------------------------------------------ layout
def pad_dim(d: int) -> int:
    """Feature dim padded to the f32 sublane tile (8). Mosaic DMA slices
    must be tiling-aligned in the sublane dim, and the (8,128)-tiled HBM
    layout physically pads it anyway — padding explicitly costs no extra
    bytes over what a [17, tr] tile DMA would already move."""
    return -(-d // 8) * 8


def pack(table: jnp.ndarray, tr: int = TR) -> jnp.ndarray:
    """[R, d] -> kernel-native packed [R/tr, d8, tr] (rows of tile t on the
    lane axis, feature dim zero-padded to the sublane tile). One-time
    transpose at init/restore; both Pallas kernels then consume tiles as
    full-dims slices with no per-step relayouts."""
    r, d = table.shape
    assert r % tr == 0, (r, tr)
    t = jnp.swapaxes(table.T.reshape(d, r // tr, tr), 0, 1)
    d8 = pad_dim(d)
    if d8 != d:
        t = jnp.pad(t, ((0, 0), (0, d8 - d), (0, 0)))
    return t


def unpack(packed: jnp.ndarray, d: int | None = None) -> jnp.ndarray:
    """Inverse of ``pack``: [nt, d8, tr] -> [R, d] (``d`` defaults to the
    stored padded dim)."""
    nt, d8, tr = packed.shape
    full = jnp.swapaxes(packed, 0, 1).reshape(d8, nt * tr).T
    return full if d is None or d == d8 else full[:, :d]


# ------------------------------------------------------------------ kernel
def _gather_kernel(tlo_ref, thi_ref, ids_ref, table_ref, out_ref, tile_s,
                   sems, *, tr, tp, n_parts):
    k = pl.program_id(0)
    lo = tlo_ref[k]  # tile of the chunk's first id
    n_t = thi_ref[k] - lo + 1  # thi: tile of the chunk's LAST id (inclusive)

    def dma(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[lo + j], tile_s.at[slot], sems.at[slot]
        )

    # warm the pipeline: issue the first NBUF-1 tile fetches
    for w in range(NBUF - 1):
        @pl.when(w < n_t)
        def _():
            dma(w, w % NBUF).start()

    ids_row = ids_ref[0:1, :]  # [1, tp]
    row_lo = jax.lax.broadcasted_iota(jnp.int32, (128, tp), 0)
    d = table_ref.shape[1]
    hb = tr // 128
    # FACTORED one-hot: onehot[row, pos] = 1[id_hi == row_hi] ·
    # 1[id_lo == row_lo]. One [128, tp] low-bits one-hot selects a row
    # from EVERY 128-row block of the tile on the MXU; the cheap [tp, d]
    # high-bit select keeps the block the id actually lives in. ~6x
    # less VPU than the full [tr, tp] compare (the round-2 hot spot);
    # same MXU FLOPs. Out-of-tile ids match no block -> contribute 0.
    # HOISTED out of the tile loop (round 3): tr % 128 == 0 makes
    # (ids - tile_base) & 127 == ids & 127 — the low-bits one-hot is
    # tile-INVARIANT, and rebuilding it per visited tile (~13x per chunk)
    # was the remaining per-tile VPU hot spot.
    ohlo = jnp.where(
        jnp.broadcast_to(ids_row & 127, (128, tp)) == row_lo, 1.0, 0.0
    ).astype(jnp.bfloat16)  # [row_lo, pos]

    def body(j, acc):
        @pl.when(j + NBUF - 1 < n_t)
        def _():
            dma(j + NBUF - 1, (j + NBUF - 1) % NBUF).start()

        slot = j % NBUF
        dma(j, slot).wait()
        local = ids_row - (lo + j) * tr  # [1, tp]
        id_hi = local >> 7
        tile = tile_s[slot]  # [d, tr]
        # every 128-row block's candidate row in ONE MXU dot: blocks stacked
        # on sublanes ([hb·d, 128] @ [128, tp]); the cheap lane-resident
        # id_hi select keeps the block each id actually lives in
        stack = jnp.concatenate(
            [tile[:, r * 128 : (r + 1) * 128] for r in range(hb)], axis=0
        )  # [hb·d, row_lo]
        if n_parts == 1:
            parts = [stack.astype(jnp.bfloat16)]
        else:
            # EXACT f32 emission: truncating 3-way bf16 split with disjoint
            # mantissa windows (split_exact_bf16 docstring); each part-dot
            # is an exact one-hot select and the f32 re-sum is exact. The
            # update kernel uses the same split on its f32 grads.
            from recmodels_tpu.embedding.pallas_update import split_exact_bf16

            parts = split_exact_bf16(stack, n_parts)
        outs = None
        for p in parts:
            o = jax.lax.dot_general(
                p, ohlo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [hb·d, pos] transposed so the id_hi mask broadcasts
            outs = o if outs is None else outs + o
        for r in range(hb):
            acc = acc + jnp.where(id_hi == r, outs[r * d : (r + 1) * d, :], 0.0)
        return acc

    acc = jax.lax.fori_loop(0, n_t, body, jnp.zeros((d, tp), jnp.float32))
    out_ref[:] = jnp.swapaxes(acc, 0, 1).astype(out_ref.dtype)


def sorted_gather(packed, sorted_ids, out_dtype=jnp.bfloat16, tp: int = TP):
    """Gather rows at SORTED ``sorted_ids`` [N] from a ``pack``-ed table
    [n_tiles, d, tr]. Returns [N, d] rows in ``out_dtype``: bf16 output is
    the exact per-value cast; f32 output from an f32 table is BIT-EXACT
    (3-part truncating bf16 split — see the kernel comment), so f32 models
    see identical numerics to an XLA gather. ids ascending in
    [0, n_tiles*tr); duplicates fine — each position matches exactly one
    one-hot row."""
    n_tiles, d, tr = packed.shape
    assert tr % 128 == 0, tr  # the hoisted low-bits one-hot relies on it
    n_parts = 3 if (jnp.dtype(out_dtype).itemsize > 2
                    and packed.dtype == jnp.float32) else 1
    n = sorted_ids.shape[0]
    n_chunks = -(-n // tp)
    npad = n_chunks * tp
    ids_p = sorted_ids
    if npad != n:
        # repeat the last id: padding gathers a real row, sliced off below
        ids_p = jnp.concatenate(
            [sorted_ids, jnp.broadcast_to(sorted_ids[-1:], (npad - n,))]
        )
    # tile bounds per chunk: tiles of its first and last sorted id
    tlo = (ids_p[::tp] // tr).astype(jnp.int32)
    thi = (ids_p[tp - 1 :: tp] // tr).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, tp), lambda k, *_: (0, k)),  # ids chunk
            pl.BlockSpec(memory_space=pl.ANY),  # packed table (manual DMA)
        ],
        out_specs=pl.BlockSpec((tp, d), lambda k, *_: (k, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, d, tr), packed.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tr=tr, tp=tp, n_parts=n_parts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, d), out_dtype),
        interpret=_interpret(),
    )(tlo, thi, ids_p.reshape(1, -1).astype(jnp.int32), packed)
    return out[:n] if npad != n else out


def supported(table) -> bool:
    """Packing applicability for a 2-D [R, d] table: tile-divisible rows,
    vector dim, on TPU (or interpret mode for tests)."""
    return (
        table.ndim == 2
        and table.shape[0] % TR == 0
        and table.shape[1] > 1
        and (_INTERPRET or jax.default_backend() != "cpu")
    )
