"""Fused sorted-scatter embedding update as a Pallas TPU kernel.

Why: XLA lowers scatter(-add) on TPU to a serialized dynamic-update-slice
loop (~100ns per updated row — measured in bench/profile_scatter.py: 10.6ms
for 106k row updates into a 2.6M x 16 table, identical for raw, hinted, and
segment_sum formulations). That made the optimizer update the dominant cost
of the whole train step. The reference hits the same hot spot as BigDL's
LookupTable.backward scatter-add (SURVEY.md §3.2); SparseCore is the
hardware answer — this kernel is the TensorCore one.

Design (v2 — duplicate-tolerant "CSR sweep"):
  1. ids are SORTED but need NOT be unique: the kernel's one-hot MXU
     contraction sums duplicate rows natively (it IS a segment-sum), which
     deletes the whole XLA dedup pipeline (segment_sum / cumsum / unique
     machinery measured at 8.3ms per step at 213k ids — vs 0.5ms for the
     argsort + grad permute that remain);
  2. the sorted update stream is cut into STATIC position-chunks
     ``[k*tr, (k+1)*tr)``. Chunks partition positions, so no entry can be
     counted twice, and chunk DMA offsets are 128-aligned by construction —
     no dynamic window alignment, no column-validity mask, no exact per-tile
     start offsets;
  3. which chunks a table tile must see is derived from a strided COARSE
     subsample (``sg[::tr]``, ~N/tr values): chunks strictly before the
     first / after the last chunk that can contain the tile's rows are
     skipped. Over-approximation is harmless — foreign entries never match
     the tile's one-hot;
  4. the kernel sweeps the table in column tiles (auto-pipelined BlockSpecs);
     each tile DMAs its first chunk double-buffered across grid steps, any
     extra chunks (only when > tr updates land in one tile) sequentially,
     expands ids with a [tr, tr] one-hot from iota-compare, and contracts on
     the MXU; then the Adagrad elementwise math — all in VMEM, written back
     in place (input_output_aliases);
  5. grads arrive as a bf16 hi/lo decomposition (hi + lo == f32 grad to
     ~2^-17 rel): two single-pass bf16 MXU dots are 2.3x faster than one
     Precision.HIGHEST f32 dot (6 passes), and DEFAULT f32 (1 truncated
     pass) was 5e-4 off.

Layout: the kernel operates on the TRANSPOSED view ``[D, R]``. XLA prefers
column-major ``{0,1}`` for the ``[R, D]`` tables (the gather's choice), and
a row-major transposed view is byte-identical to that — so wrapping the
kernel in ``table.T`` / ``.T`` lets layout assignment cancel the transposes
instead of materializing full-table relayout copies (which cost 8.8ms/step
in the first, row-major version of this kernel).

Requires table rows % tr == 0 — EmbeddingCollection pads allocations to
ALLOC_MULTIPLE rows (logical vocab unchanged; pad rows are never gathered;
sorted sentinel ids (>= num_rows) at the tail match no tile row and their
grads are zero).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 512  # table rows per tile == update-chunk length (both 128-multiples)

_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _adagrad_kernel(pos_ref, lr_ref, uids_ref, *rest, eps, n_chunks,
                    two_part, emit_shadow):
    shadow_out = None
    if two_part:  # f32 grads decomposed into bf16 hi + lo halves
        if emit_shadow:
            (ghi_ref, glo_ref, table_ref, acc_ref, table_out, acc_out,
             shadow_out, ids_s, ghi_s, glo_s, sems) = rest
        else:
            (ghi_ref, glo_ref, table_ref, acc_ref, table_out, acc_out,
             ids_s, ghi_s, glo_s, sems) = rest
        g_refs, g_scratch = (ghi_ref, glo_ref), (ghi_s, glo_s)
    else:  # grads arrived bf16 — a single exact dot suffices
        if emit_shadow:
            (ghi_ref, table_ref, acc_ref, table_out, acc_out,
             shadow_out, ids_s, ghi_s, sems) = rest
        else:
            (ghi_ref, table_ref, acc_ref, table_out, acc_out,
             ids_s, ghi_s, sems) = rest
        g_refs, g_scratch = (ghi_ref,), (ghi_s,)
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    lr = lr_ref[0, 0]
    tr = ids_s.shape[2]

    def first_chunk(tile):
        # pos_ref[tile] = searchsorted(coarse, tile*tr, 'left'); every chunk
        # strictly before pos-1 ends below tile*tr, so pos-1 (clamped into
        # range) is the first chunk that can hold this tile's rows.
        p = pos_ref[tile]
        return jnp.clip(p - 1, 0, n_chunks - 1)

    def chunk_dmas(chunk, slot):
        off = pl.multiple_of(chunk * tr, 128)
        dmas = [
            pltpu.make_async_copy(
                uids_ref.at[0, pl.ds(off, tr)], ids_s.at[slot, 0, :], sems.at[slot, 0]
            )
        ]
        for j, (ref, scr) in enumerate(zip(g_refs, g_scratch)):
            dmas.append(
                pltpu.make_async_copy(
                    ref.at[:, pl.ds(off, tr)], scr.at[slot], sems.at[slot, 1 + j]
                )
            )
        return dmas

    lo_t = first_chunk(t)

    @pl.when(t == 0)
    def _():
        for dma in chunk_dmas(lo_t, 0):
            dma.start()

    # prefetch next tile's first chunk while this tile computes
    @pl.when(t + 1 < n_t)
    def _():
        for dma in chunk_dmas(first_chunk(t + 1), (t + 1) % 2):
            dma.start()

    slot = t % 2
    for dma in chunk_dmas(lo_t, slot):
        dma.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (tr, tr), 0) + t * tr
    # Select in f32 layout (the i1 mask lives in 32-bit (8,128) tiling;
    # Mosaic can't relayout i1 straight to bf16 (16,128)), cast for the MXU.
    dims = (((1,), (1,)), ((), ()))

    def chunk_g(s):
        onehot = jnp.where(
            jnp.broadcast_to(ids_s[s, 0:1, :], (tr, tr)) == row, 1.0, 0.0
        ).astype(jnp.bfloat16)
        parts = [
            jax.lax.dot_general(
                scr[s], onehot, dims, preferred_element_type=jnp.float32
            )
            for scr in g_scratch
        ]
        return sum(parts[1:], parts[0])  # [D16, tr]

    g = chunk_g(slot)

    # Rare path: more than tr updates landed in this tile (heavy duplicate
    # skew) — sweep its remaining chunks sequentially through this tile's
    # own slot (the cross-tile prefetch lives in the other slot). The
    # exclusive end is pos_ref[t+1]: chunks at or past it start at ids
    # >= (t+1)*tr. The loop runs ZERO iterations in the common case.
    nc = pos_ref[t + 1] - lo_t

    def body(i, g_acc):
        dmas = chunk_dmas(lo_t + i, slot)
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()
        return g_acc + chunk_g(slot)

    g = jax.lax.fori_loop(1, nc, body, g)

    g = g[: acc_ref.shape[0], :]  # drop sublane padding (d16 -> d)
    acc_new = acc_ref[:] + g * g
    t_new = table_ref[:] - lr * g / (jnp.sqrt(acc_new) + eps)
    table_out[:] = t_new
    acc_out[:] = acc_new
    if emit_shadow:
        # row-major bf16 replica for the next step's gather: the master
        # stays column-major (this kernel's fast view), but XLA's row
        # gather against a column-major table costs ~1.6ms extra at 213k
        # rows. Every tile is visited, so the shadow fully regenerates.
        shadow_out[:] = jnp.swapaxes(t_new, 0, 1).astype(shadow_out.dtype)


def sorted_adagrad_update(table, acc, uids, gsum, lr, eps, tr: int = TR,
                          shadow_dtype=None):
    """Fused Adagrad over a SORTED (duplicates allowed) update stream.

    table, acc: [R, D] with R % tr == 0. uids: [N] sorted int32 — raw sorted
    batch ids; duplicates are summed exactly by the one-hot contraction.
    Sentinels (>= R) may pad the tail. gsum: [N, D] grads in the same order;
    f32 grads ride a bf16 hi/lo pair (two MXU dots), bf16 grads a single
    dot. Returns (table', acc') updated in place (donated via aliasing), or
    (table', acc', shadow') when ``shadow_dtype`` is set — shadow' is a
    freshly written ROW-MAJOR low-precision replica for fast gathers.
    """
    r, d = table.shape
    assert r % tr == 0, (r, tr)
    assert tr % 128 == 0, tr
    n = uids.shape[0]
    n_tiles = r // tr
    n_chunks = -(-n // tr)
    npad = n_chunks * tr
    # pad the stream to whole chunks; pad the transposed grad buffer's
    # sublane dim to a multiple of 16 (bf16 DMA slices need tiling-aligned
    # sublane shapes — O(batch) cost only), then split f32 grads into the
    # bf16 hi/lo pair (see module docstring).
    two_part = gsum.dtype != jnp.bfloat16
    d16 = -(-d // 16) * 16
    uids_p = jnp.concatenate(
        [uids, jnp.full((npad - n,), jnp.iinfo(jnp.int32).max, jnp.int32)]
    )
    gsum_t = jnp.concatenate([gsum, jnp.zeros((npad - n, d), gsum.dtype)]).T
    if d16 != d:
        gsum_t = jnp.pad(gsum_t, ((0, d16 - d), (0, 0)))
    ghi = gsum_t.astype(jnp.bfloat16)
    g_ops = [ghi]
    if two_part:
        g_ops.append((gsum_t.astype(jnp.float32) - ghi.astype(jnp.float32))
                     .astype(jnp.bfloat16))
    # Coarse chunk index: coarse[k] = first id of chunk k. With
    # P[t] = searchsorted(coarse, t*tr, 'left'), tile t's rows can only
    # live in chunks [max(P[t]-1, 0), P[t+1]): every chunk k <= P[t]-2 ends
    # at coarse[k+1] < t*tr (sorted), every chunk k >= P[t+1] starts at
    # coarse[k] >= (t+1)*tr. Over-coverage is exact — foreign ids never
    # match the tile's one-hot.
    coarse = uids_p[::tr]
    bounds = (jnp.arange(n_tiles + 1, dtype=jnp.int32) * tr).astype(jnp.int32)
    if (n_tiles + 1) * n_chunks <= 16 * 2**20:
        # fully vectorized count-less-than beats both searchsorted lowerings
        # (scan serializes; method='sort' drags 4 small sort/copy ops):
        # 0.11ms vs 0.34ms at 5081 tiles x 416 chunks on v5e.
        pos = jnp.sum(coarse[None, :] < bounds[:, None], axis=1, dtype=jnp.int32)
    else:
        pos = jnp.searchsorted(
            coarse, bounds, side="left", method="sort"
        ).astype(jnp.int32)

    n_parts = len(g_ops)
    emit_shadow = shadow_dtype is not None
    out_specs = [
        pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
        pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((d, r), table.dtype),
        jax.ShapeDtypeStruct((d, r), acc.dtype),
    ]
    if emit_shadow:
        out_specs.append(pl.BlockSpec((tr, d), lambda t, *_: (t, 0)))
        out_shape.append(jax.ShapeDtypeStruct((r, d), shadow_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),  # lr
            pl.BlockSpec(memory_space=pl.ANY),  # uids (chunks DMA'd manually)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_parts  # grad bf16 part(s)
        + [
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),  # table^T tile
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),  # acc^T tile
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((2, 1, tr), jnp.int32)]  # id chunks
        + [pltpu.VMEM((2, d16, tr), jnp.bfloat16)] * n_parts  # grad chunks
        + [pltpu.SemaphoreType.DMA((2, 1 + n_parts))],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    alias_base = 3 + n_parts  # pos, lr, uids operands precede the grad parts
    outs = pl.pallas_call(
        functools.partial(_adagrad_kernel, eps=eps, n_chunks=n_chunks,
                          two_part=two_part, emit_shadow=emit_shadow),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases={alias_base: 0, alias_base + 1: 1},  # in place
        interpret=_interpret(),
    )(pos, lr_arr, uids_p.reshape(1, -1), *g_ops, table.T, acc.T)
    if emit_shadow:
        table2_t, acc2_t, shadow2 = outs
        return table2_t.T, acc2_t.T, shadow2
    table2_t, acc2_t = outs
    return table2_t.T, acc2_t.T


def supported(table) -> bool:
    """Kernel applicability: 2-D table, tile-divisible rows, real TPU (or
    interpret mode for tests — on CPU the XLA paths are the implementation)."""
    return (
        table.ndim == 2
        and table.shape[0] % TR == 0
        and (_INTERPRET or jax.default_backend() != "cpu")
    )
