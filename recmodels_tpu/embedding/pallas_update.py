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
     ``[k*tc, (k+1)*tc)``. Chunks partition positions, so no entry can be
     counted twice, and chunk DMA offsets are 128-aligned by construction —
     no dynamic window alignment, no column-validity mask, no exact per-tile
     start offsets;
  3. which chunks a table tile must see is derived from a strided COARSE
     subsample (``sg[::tc]``, ~N/tc values): chunks strictly before the
     first / after the last chunk that can contain the tile's rows are
     skipped. Over-approximation is harmless — foreign entries never match
     the tile's one-hot;
  4. the kernel sweeps the table in tiles (auto-pipelined BlockSpecs);
     each tile DMAs its first chunk double-buffered across grid steps, any
     extra chunks (only when > tc updates land in one tile) sequentially,
     expands ids with a [tc, tr] one-hot from iota-compare, and contracts on
     the MXU; then the Adagrad elementwise math — all in VMEM, written back
     in place (input_output_aliases);
  5. grads arrive as a bf16 hi/lo decomposition (hi + lo == f32 grad to
     ~2^-17 rel): two single-pass bf16 MXU dots are 2.3x faster than one
     Precision.HIGHEST f32 dot (6 passes), and DEFAULT f32 (1 truncated
     pass) was 5e-4 off. bf16 grads (bf16-compute models) take one exact dot.

Layouts: two table layouts are accepted —
  * PACKED [n_tiles, d, tr] (``pallas_gather.pack``): tile t is a full-dims
    slice ``packed[t]`` — the layout the sweep-gather kernel needs, so
    LocalTables stores the master this way and both kernels consume it with
    zero relayouts;
  * TRANSPOSED 2-D [d, R] view (``table.T`` of the [R, d] master): XLA
    prefers column-major {0,1} for [R, d] tables, and a row-major transposed
    view is byte-identical to that — kept for ShardedTables' per-shard
    updates, where gathers still run through XLA.

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

TR = 512  # table rows per tile (128-multiple; == pallas_gather.TR)
TC = 512  # update-stream positions per chunk (128-multiple)

_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _adagrad_kernel(pos_ref, lr_ref, uids_ref, *rest, eps, n_chunks,
                    two_part, packed, tc):
    if two_part:  # f32 grads decomposed into bf16 hi + lo halves
        (ghi_ref, glo_ref, table_ref, acc_ref, table_out, acc_out,
         ids_s, ghi_s, glo_s, sems) = rest
        g_refs, g_scratch = (ghi_ref, glo_ref), (ghi_s, glo_s)
    else:  # grads arrived bf16 — a single exact dot suffices
        (ghi_ref, table_ref, acc_ref, table_out, acc_out,
         ids_s, ghi_s, sems) = rest
        g_refs, g_scratch = (ghi_ref,), (ghi_s,)
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    lr = lr_ref[0, 0]
    tr = table_ref.shape[-1]

    def first_chunk(tile):
        # pos_ref[tile] = searchsorted(coarse, tile*tr, 'left'); every chunk
        # strictly before pos-1 ends below tile*tr, so pos-1 (clamped into
        # range) is the first chunk that can hold this tile's rows.
        p = pos_ref[tile]
        return jnp.clip(p - 1, 0, n_chunks - 1)

    def chunk_dmas(chunk, slot):
        off = pl.multiple_of(chunk * tc, 128)
        dmas = [
            pltpu.make_async_copy(
                uids_ref.at[0, pl.ds(off, tc)], ids_s.at[slot, 0, :], sems.at[slot, 0]
            )
        ]
        for j, (ref, scr) in enumerate(zip(g_refs, g_scratch)):
            dmas.append(
                pltpu.make_async_copy(
                    ref.at[:, pl.ds(off, tc)], scr.at[slot], sems.at[slot, 1 + j]
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

    # onehot[row, pos]: row on sublanes via iota, ids broadcast along lanes
    # (pos) — no relayout of the id vector. Select in f32 layout (the i1
    # mask lives in 32-bit (8,128) tiling; Mosaic can't relayout i1 straight
    # to bf16 (16,128)), cast for the MXU.
    row = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0) + t * tr

    def chunk_g(s):
        onehot = jnp.where(
            jnp.broadcast_to(ids_s[s, 0:1, :], (tr, tc)) == row, 1.0, 0.0
        ).astype(jnp.bfloat16)
        parts = [
            jax.lax.dot_general(
                scr[s], onehot, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for scr in g_scratch
        ]
        return sum(parts[1:], parts[0])  # [D16, tr]

    g = chunk_g(slot)

    # Rare path: more than tc updates landed in this tile (heavy duplicate
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

    def rd(ref):
        return ref[0] if packed else ref[:]

    d = table_ref.shape[-2] if packed else table_ref.shape[0]
    g = g[:d, :]  # drop sublane padding (d16 -> d)
    acc_new = rd(acc_ref) + g * g
    t_new = rd(table_ref) - lr * g / (jnp.sqrt(acc_new) + eps)
    if packed:
        table_out[0] = t_new
        acc_out[0] = acc_new
    else:
        table_out[:] = t_new
        acc_out[:] = acc_new


def _prep_stream(uids, gsum, tc):
    """Pad the sorted stream to whole chunks; transpose + sublane-pad the
    grads and split f32 into the bf16 hi/lo pair (module docstring)."""
    n, d = gsum.shape[0], gsum.shape[1]
    n_chunks = -(-n // tc)
    npad = n_chunks * tc
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
    return uids_p, g_ops, n_chunks, two_part, d16


def _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks):
    """pos[t] = searchsorted(coarse, t*tr, 'left') where coarse[k] = first
    id of chunk k. Tile t's rows can only live in chunks
    [max(pos[t]-1, 0), pos[t+1]): every chunk k <= pos[t]-2 ends at
    coarse[k+1] < t*tr (sorted), every chunk k >= pos[t+1] starts at
    coarse[k] >= (t+1)*tr. Over-coverage is exact — foreign ids never match
    the tile's one-hot."""
    coarse = uids_p[::tc]
    bounds = (jnp.arange(n_tiles + 1, dtype=jnp.int32) * tr).astype(jnp.int32)
    if (n_tiles + 1) * n_chunks <= 16 * 2**20:
        # fully vectorized count-less-than beats both searchsorted lowerings
        # (scan serializes; method='sort' drags 4 small sort/copy ops):
        # 0.11ms vs 0.34ms at 5081 tiles x 416 chunks on v5e.
        return jnp.sum(coarse[None, :] < bounds[:, None], axis=1, dtype=jnp.int32)
    return jnp.searchsorted(coarse, bounds, side="left", method="sort").astype(jnp.int32)


def _call_kernel(table_op, acc_op, table_spec, acc_spec, out_shape, out_specs,
                 pos, lr, uids_p, g_ops, *, eps, n_chunks, two_part, packed,
                 n_tiles, tc, d16):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),  # lr
            pl.BlockSpec(memory_space=pltpu.ANY),  # uids (chunks DMA'd manually)
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * len(g_ops)  # grad bf16 part(s)
        + [table_spec, acc_spec],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((2, 1, tc), jnp.int32)]  # id chunks
        + [pltpu.VMEM((2, d16, tc), jnp.bfloat16)] * len(g_ops)  # grad chunks
        + [pltpu.SemaphoreType.DMA((2, 1 + len(g_ops)))],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    alias_base = 3 + len(g_ops)  # pos, lr, uids operands precede grad parts
    return pl.pallas_call(
        functools.partial(_adagrad_kernel, eps=eps, n_chunks=n_chunks,
                          two_part=two_part, packed=packed, tc=tc),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={alias_base: 0, alias_base + 1: 1},  # in place
        interpret=_interpret(),
    )(pos, lr_arr, uids_p.reshape(1, -1), *g_ops, table_op, acc_op)


def sorted_adagrad_update(table, acc, uids, gsum, lr, eps, tr: int = TR,
                          tc: int = TC):
    """Fused Adagrad over a SORTED (duplicates allowed) update stream.

    table, acc: [R, D] with R % tr == 0. uids: [N] sorted int32 — raw sorted
    batch ids; duplicates are summed exactly by the one-hot contraction.
    Sentinels (>= R) may pad the tail. gsum: [N, D] grads in the same order;
    f32 grads ride a bf16 hi/lo pair (two MXU dots), bf16 grads a single
    dot. Returns (table', acc') updated in place (donated via aliasing)."""
    r, d = table.shape
    assert r % tr == 0, (r, tr)
    n_tiles = r // tr
    uids_p, g_ops, n_chunks, two_part, d16 = _prep_stream(uids, gsum, tc)
    pos = _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks)
    spec = pl.BlockSpec((d, tr), lambda t, *_: (0, t))
    table2_t, acc2_t = _call_kernel(
        table.T, acc.T, spec, spec,
        [jax.ShapeDtypeStruct((d, r), table.dtype),
         jax.ShapeDtypeStruct((d, r), acc.dtype)],
        [pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
         pl.BlockSpec((d, tr), lambda t, *_: (0, t))],
        pos, lr, uids_p, g_ops, eps=eps, n_chunks=n_chunks, two_part=two_part,
        packed=False, n_tiles=n_tiles, tc=tc, d16=d16,
    )
    return table2_t.T, acc2_t.T


def sorted_adagrad_update_packed(table, acc, uids, gsum, lr, eps,
                                 tc: int = TC):
    """``sorted_adagrad_update`` over PACKED [n_tiles, d, tr] table/acc
    (``pallas_gather.pack``) — LocalTables' master layout, shared with the
    sweep-gather kernel."""
    n_tiles, d, tr = table.shape
    uids_p, g_ops, n_chunks, two_part, d16 = _prep_stream(uids, gsum, tc)
    pos = _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks)
    spec = pl.BlockSpec((1, d, tr), lambda t, *_: (t, 0, 0))
    return _call_kernel(
        table, acc, spec, spec,
        [jax.ShapeDtypeStruct((n_tiles, d, tr), table.dtype),
         jax.ShapeDtypeStruct((n_tiles, d, tr), acc.dtype)],
        [pl.BlockSpec((1, d, tr), lambda t, *_: (t, 0, 0)),
         pl.BlockSpec((1, d, tr), lambda t, *_: (t, 0, 0))],
        pos, lr, uids_p, g_ops, eps=eps, n_chunks=n_chunks, two_part=two_part,
        packed=True, n_tiles=n_tiles, tc=tc, d16=d16,
    )


def supported(table) -> bool:
    """Kernel applicability: 2-D [R, D] (tile-divisible rows) or packed 3-D
    table, on real TPU (or interpret mode for tests — on CPU the XLA paths
    are the implementation)."""
    ok_shape = (table.ndim == 2 and table.shape[0] % TR == 0) or (
        table.ndim == 3 and table.shape[-1] == TR
    )
    return ok_shape and (_INTERPRET or jax.default_backend() != "cpu")
