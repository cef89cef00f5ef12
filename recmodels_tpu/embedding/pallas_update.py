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
  5. f32 grads arrive as an EXACT 3-part truncating bf16 split (the same
     disjoint-mantissa-window construction as pallas_gather's exact-f32
     emission: each part is a bf16 with an 8-bit slice of the 24-bit
     mantissa, parts re-sum to the f32 grad with zero residual). Each
     part-dot's products are exact bf16*1.0 selects accumulated in f32, so
     a UNIQUE sorted id reproduces its f32 grad bit-exactly; duplicate ids
     are summed in f32 in chunk-position order, which may differ from XLA's
     segment-sum order by f32 rounding ulps (both are f32-rounded sums —
     neither is "the" exact value). The downstream elementwise Adagrad math
     (acc + g*g, the sqrt/divide) is additionally subject to compiler FMA
     contraction, so outputs match the XLA path to ~1 ulp per op, not
     bitwise. Three single-pass bf16 MXU dots still
     beat one Precision.HIGHEST f32 dot (6 passes); the earlier 2-part
     rounded hi/lo variant (~2^-17 rel error on g) was replaced in round 3
     because it silently changed f32 training numerics (ADVICE.md r2 #1).
     bf16 grads (bf16-compute models) take one exact dot.

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

TR = 1024  # table rows per tile (128-multiple; == pallas_gather.TR)
TC = 512  # update-stream positions per chunk (128-multiple)

_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _adagrad_kernel(pos_ref, lr_ref, uids_ref, *rest, eps, n_chunks,
                    n_ops, packed, tc):
    # n_ops grad operands: 1 (grads arrived bf16 — one exact dot) or 3
    # (f32 grads as the exact truncating bf16 split, module docstring #5)
    g_refs = rest[:n_ops]
    table_ref, acc_ref, table_out, acc_out, ids_s = rest[n_ops : n_ops + 5]
    g_scratch = rest[n_ops + 5 : 2 * n_ops + 5]
    sems = rest[2 * n_ops + 5]
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

    # FACTORED one-hot (v3): onehot[row, pos] = 1[id_hi == row_hi] ·
    # 1[id_lo == row_lo] with row = row_hi*128 + row_lo. The full [tr, tc]
    # iota-compare was the kernel's VPU hot spot (~0.8µs of a ~1.0µs tile
    # visit at tr=tc=512); the factored form builds one [128, tc] low-bits
    # one-hot (tile-invariant — _chunk_ohlo) plus tr/128 cheap [1, tc]
    # high-bit masks folded into the grad operand, then contracts per
    # high-block — same MXU FLOPs, ~6x less VPU. Out-of-tile ids get a
    # negative/large `local`, so id_hi matches no block and they drop out
    # exactly as before. Compares run in 32-bit layout then cast (Mosaic
    # can't relayout i1 straight to bf16).
    hb = tr // 128

    def chunk_g(s):
        local = ids_s[s, 0:1, :] - t * tr  # [1, tc]
        id_hi = local >> 7
        ohlo = _chunk_ohlo(ids_s[s, 0:1, :], tc)  # [128, tc]
        blocks = []
        for r in range(hb):
            mask = jnp.where(id_hi == r, 1.0, 0.0).astype(jnp.bfloat16)
            parts = [
                jax.lax.dot_general(
                    scr[s] * mask, ohlo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for scr in g_scratch
            ]
            blocks.append(sum(parts[1:], parts[0]))  # [D16, 128]
        return jnp.concatenate(blocks, axis=1)  # [D16, tr]

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


def split_exact_bf16(x32, n_parts: int = 3):
    """EXACT truncating bf16 split of f32 (same construction as
    pallas_gather's exact-f32 emission): part i takes the next 8 leading
    mantissa bits via a bitmask truncation (exact), the f32 subtraction of
    an exactly-representable part is exact, and after ``n_parts - 1``
    truncations the residual's mantissa fits one bf16. Parts re-sum to x
    with zero residual (disjoint ≤8-bit mantissa windows spanning ≤24
    bits; f32 denormals flush on TPU anyway)."""
    parts, rem = [], x32
    for _ in range(n_parts - 1):
        bits = jax.lax.bitcast_convert_type(rem, jnp.int32)
        p32 = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
        parts.append(p32.astype(jnp.bfloat16))
        rem = rem - p32
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _prep_stream(uids, gsum, tc, count_row: bool = False):
    """Pad the sorted stream to whole chunks; transpose + sublane-pad the
    grads and split f32 into the exact 3-part bf16 decomposition (module
    docstring #5). bf16 grads pass through as a single operand.

    ``count_row``: additionally set padding row ``d`` of the (transposed)
    grad operand to 1.0 — the one-hot contraction then yields each table
    row's OCCURRENCE COUNT in that feature row, which the lazy-Adam kernel
    uses as its touched-row mask (lazy semantics: untouched rows must not
    decay, and "touched" is membership in the id stream, not g != 0).
    Sentinel-padded tail positions match no tile, so the count stays exact
    without masking the ones row."""
    n, d = gsum.shape[0], gsum.shape[1]
    n_chunks = -(-n // tc)
    npad = n_chunks * tc
    d_eff = d + 1 if count_row else d
    d16 = -(-d_eff // 16) * 16
    uids_p = jnp.concatenate(
        [uids, jnp.full((npad - n,), jnp.iinfo(jnp.int32).max, jnp.int32)]
    )
    gsum_t = jnp.concatenate([gsum, jnp.zeros((npad - n, d), gsum.dtype)]).T
    if d16 != d:
        gsum_t = jnp.pad(gsum_t, ((0, d16 - d), (0, 0)))
    if count_row:
        gsum_t = gsum_t.at[d, :].set(1.0)
    if gsum.dtype == jnp.bfloat16:
        g_ops = [gsum_t]
    else:
        g_ops = split_exact_bf16(gsum_t.astype(jnp.float32))
    return uids_p, g_ops, n_chunks, d16


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
                 pos, lr, uids_p, g_ops, *, eps, n_chunks, packed,
                 n_tiles, tc, d16):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),  # lr
            pl.BlockSpec(memory_space=pl.ANY),  # uids (chunks DMA'd manually)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(g_ops)  # grad bf16 part(s)
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
                          n_ops=len(g_ops), packed=packed, tc=tc),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={alias_base: 0, alias_base + 1: 1},  # in place
        interpret=_interpret(),
    )(pos, lr_arr, uids_p.reshape(1, -1), *g_ops, table_op, acc_op)


def sorted_adagrad_update(table, acc, uids, gsum, lr, eps, tr: int = TR,
                          tc: int = TC):
    """Fused Adagrad over a SORTED (duplicates allowed) update stream.

    table, acc: [R, D] with R % tr == 0. uids: [N] sorted int32 — raw sorted
    batch ids; duplicates are summed by the one-hot contraction (f32
    accumulation; see module docstring #5 for the exactness contract).
    Sentinels (>= R) may pad the tail. gsum: [N, D] grads in the same order;
    f32 grads ride the exact 3-part bf16 split (three MXU dots), bf16 grads
    a single dot. Returns (table', acc') updated in place (donated via
    aliasing)."""
    r, d = table.shape
    assert r % tr == 0, (r, tr)
    n_tiles = r // tr
    uids_p, g_ops, n_chunks, d16 = _prep_stream(uids, gsum, tc)
    pos = _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks)
    spec = pl.BlockSpec((d, tr), lambda t, *_: (0, t))
    table2_t, acc2_t = _call_kernel(
        table.T, acc.T, spec, spec,
        [jax.ShapeDtypeStruct((d, r), table.dtype),
         jax.ShapeDtypeStruct((d, r), acc.dtype)],
        [pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
         pl.BlockSpec((d, tr), lambda t, *_: (0, t))],
        pos, lr, uids_p, g_ops, eps=eps, n_chunks=n_chunks,
        packed=False, n_tiles=n_tiles, tc=tc, d16=d16,
    )
    return table2_t.T, acc2_t.T


def _chunk_ohlo(ids_row, tc):
    """[128, tc] low-bits one-hot for one chunk — TILE-invariant
    (tr % 128 == 0 makes (ids - tile_base) & 127 == ids & 127), so callers
    build it ONCE per chunk and share it across every tile the chunk
    touches (rebuilding it per (chunk, tile) visit was the round-2 kernel's
    VPU hot spot)."""
    row_lo = jax.lax.broadcasted_iota(jnp.int32, (128, tc), 0)
    return jnp.where(
        jnp.broadcast_to(ids_row & 127, (128, tc)) == row_lo, 1.0, 0.0
    ).astype(jnp.bfloat16)


def _factored_contract(ids_row, g_vals, tile_base, tr, tc, ohlo):
    """[d16, tr] grad segment-sum for one (chunk, tile) pair via the
    factored one-hot (see _adagrad_kernel docstring). ids_row [1, tc];
    g_vals: tuple of [d16, tc] bf16 operands (hi or hi+lo); ohlo the
    chunk's precomputed ``_chunk_ohlo``.

    The per-high-block masked grads are STACKED on sublanes so the whole
    tile contracts in ONE MXU dot per grad part (4 small [d16,tc]@[tc,128]
    dots pay ~4x the invocation overhead of one [4·d16,tc]@[tc,128])."""
    local = ids_row - tile_base  # [1, tc]
    id_hi = local >> 7
    hb = tr // 128
    masks = [
        jnp.where(id_hi == r, 1.0, 0.0).astype(jnp.bfloat16) for r in range(hb)
    ]
    g = None
    for gv in g_vals:
        d16 = gv.shape[0]
        stack = jnp.concatenate([gv * m for m in masks], axis=0)  # [hb·d16, tc]
        out = jax.lax.dot_general(
            stack, ohlo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [hb·d16, 128]
        part = jnp.concatenate(
            [out[r * d16 : (r + 1) * d16, :] for r in range(hb)], axis=1
        )  # [d16, tr]
        g = part if g is None else g + part
    return g


def _packed_kernel(pos_ref, lr_ref, uids_ref, *rest, eps, n_chunks, n_ops,
                   tb, tc):
    """Packed-layout update, TB tiles per grid step.

    The step's FIRST candidate chunk rides auto-pipelined blocks (ids_blk /
    grad blks, index maps driven by the pos scalars); consecutive tiles
    almost always share it because one tc-chunk spans ~12 tiles at the
    flagship shape. Extra chunks (heavy duplicate skew) go through a
    sequential manual-DMA rare path, zero iterations in the common case."""
    g_hbm = rest[:n_ops]
    g_blks = rest[n_ops : 2 * n_ops]
    ids_blk, table_ref, acc_ref, table_out, acc_out = rest[2 * n_ops : 2 * n_ops + 5]
    scratch = rest[2 * n_ops + 5 :]
    ids_x, g_x, sems = scratch[0], scratch[1 : 1 + n_ops], scratch[1 + n_ops]
    t = pl.program_id(0)
    lr = lr_ref[0, 0]
    tr = table_ref.shape[-1]
    d = table_ref.shape[-2]
    c0 = jnp.clip(pos_ref[t * tb] - 1, 0, n_chunks - 1)
    ids_row0 = ids_blk[0:1, :]
    g_vals0 = tuple(g[:, :] for g in g_blks)
    ohlo0 = _chunk_ohlo(ids_row0, tc)  # shared by every tile of this step

    for r in range(tb):
        tile = t * tb + r
        base = tile * tr
        lo_r = jnp.clip(pos_ref[tile] - 1, 0, n_chunks - 1)
        hi_r = pos_ref[tile + 1]
        # common case: the tile's first candidate chunk IS the block chunk;
        # compute unconditionally, mask if this tile starts later
        use_blk = jnp.where(lo_r == c0, 1.0, 0.0)
        g = _factored_contract(ids_row0, g_vals0, base, tr, tc, ohlo0) * use_blk

        def body(ci, g_acc):
            off = pl.multiple_of(ci * tc, 128)
            dmas = [pltpu.make_async_copy(
                uids_ref.at[0, pl.ds(off, tc)], ids_x.at[0, :], sems.at[0]
            )]
            for j, scr in enumerate(g_x):
                dmas.append(pltpu.make_async_copy(
                    g_hbm[j].at[:, pl.ds(off, tc)], scr, sems.at[1 + j]
                ))
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()
            ids_r = ids_x[0:1, :]
            return g_acc + _factored_contract(
                ids_r, tuple(s[:, :] for s in g_x), base, tr, tc,
                _chunk_ohlo(ids_r, tc),
            )

        g = jax.lax.fori_loop(jnp.maximum(lo_r, c0 + 1), hi_r, body, g)

        g = g[:d, :]
        acc_new = acc_ref[r] + g * g
        table_out[r] = table_ref[r] - lr * g / (jnp.sqrt(acc_new) + eps)
        acc_out[r] = acc_new


def sorted_adagrad_update_packed(table, acc, uids, gsum, lr, eps,
                                 tc: int = TC, tb: int = 8):
    """``sorted_adagrad_update`` over PACKED [n_tiles, d, tr] table/acc
    (``pallas_gather.pack``) — LocalTables' master layout, shared with the
    sweep-gather kernel. Processes ``tb`` tiles per grid step so the
    auto-pipelined table/acc block copies amortize DMA latency."""
    n_tiles, d, tr = table.shape
    while n_tiles % tb:
        tb //= 2
    uids_p, g_ops, n_chunks, d16 = _prep_stream(uids, gsum, tc)
    pos = _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks)

    def c0_map(t, pos_ref):
        return (0, jnp.clip(pos_ref[t * tb] - 1, 0, n_chunks - 1))

    tile_spec = pl.BlockSpec((tb, d, tr), lambda t, *_: (t, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # uids (rare-path manual DMA)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(g_ops)  # grads (rare path)
        + [pl.BlockSpec((d16, tc), c0_map)] * len(g_ops)  # grads chunk c0
        + [
            pl.BlockSpec((1, tc), c0_map),  # ids chunk c0
            tile_spec,  # table tiles
            tile_spec,  # acc tiles
        ],
        out_specs=[tile_spec, tile_spec],
        scratch_shapes=[pltpu.VMEM((1, tc), jnp.int32)]
        + [pltpu.VMEM((d16, tc), jnp.bfloat16)] * len(g_ops)
        + [pltpu.SemaphoreType.DMA((1 + len(g_ops),))],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    n_ops = len(g_ops)
    alias_base = 4 + 2 * n_ops  # pos, lr, uids, g_hbm*, g_blk*, ids_blk
    outs = pl.pallas_call(
        functools.partial(
            _packed_kernel, eps=eps, n_chunks=n_chunks, n_ops=n_ops,
            tb=tb, tc=tc,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, d, tr), table.dtype),
            jax.ShapeDtypeStruct((n_tiles, d, tr), acc.dtype),
        ],
        input_output_aliases={alias_base: 0, alias_base + 1: 1},
        interpret=_interpret(),
    )(pos, lr_arr, uids_p.reshape(1, -1), *g_ops, *g_ops,
      uids_p.reshape(1, -1), table, acc)
    return outs


def _adam_packed_kernel(pos_ref, sc_ref, uids_ref, *rest, b1, b2, eps,
                        n_chunks, n_ops, tb, tc, d, d_count):
    """Packed-layout LAZY-ADAM update, TB tiles per grid step. Same sweep /
    chunk / factored-one-hot structure as ``_packed_kernel``; the grad
    operand carries the count feature in row ``d`` (``_prep_stream``
    count_row), so ``touched = count > 0`` gates the moment decay exactly
    like membership in the dedup'd id set (SURVEY.md §7 hard part 2 lazy
    semantics). Bias-correction denominators arrive precomputed in SMEM
    (sc = [lr, 1-b1^t, 1-b2^t])."""
    g_hbm = rest[:n_ops]
    g_blks = rest[n_ops : 2 * n_ops]
    (ids_blk, table_ref, m_ref, v_ref,
     table_out, m_out, v_out) = rest[2 * n_ops : 2 * n_ops + 7]
    scratch = rest[2 * n_ops + 7 :]
    ids_x, g_x, sems = scratch[0], scratch[1 : 1 + n_ops], scratch[1 + n_ops]
    t = pl.program_id(0)
    lr = sc_ref[0, 0]
    bc1 = sc_ref[0, 1]
    bc2 = sc_ref[0, 2]
    tr = table_ref.shape[-1]
    c0 = jnp.clip(pos_ref[t * tb] - 1, 0, n_chunks - 1)
    ids_row0 = ids_blk[0:1, :]
    g_vals0 = tuple(g[:, :] for g in g_blks)
    ohlo0 = _chunk_ohlo(ids_row0, tc)

    for r in range(tb):
        tile = t * tb + r
        base = tile * tr
        lo_r = jnp.clip(pos_ref[tile] - 1, 0, n_chunks - 1)
        hi_r = pos_ref[tile + 1]
        use_blk = jnp.where(lo_r == c0, 1.0, 0.0)
        g = _factored_contract(ids_row0, g_vals0, base, tr, tc, ohlo0) * use_blk

        def body(ci, g_acc):
            off = pl.multiple_of(ci * tc, 128)
            dmas = [pltpu.make_async_copy(
                uids_ref.at[0, pl.ds(off, tc)], ids_x.at[0, :], sems.at[0]
            )]
            for j, scr in enumerate(g_x):
                dmas.append(pltpu.make_async_copy(
                    g_hbm[j].at[:, pl.ds(off, tc)], scr, sems.at[1 + j]
                ))
            for dma in dmas:
                dma.start()
            for dma in dmas:
                dma.wait()
            ids_r = ids_x[0:1, :]
            return g_acc + _factored_contract(
                ids_r, tuple(s[:, :] for s in g_x), base, tr, tc,
                _chunk_ohlo(ids_r, tc),
            )

        g = jax.lax.fori_loop(jnp.maximum(lo_r, c0 + 1), hi_r, body, g)

        # count feature lives at the GRAD dim index (table d is sublane-
        # padded wider than the grad width)
        touched = g[d_count : d_count + 1, :] > 0.5  # [1, tr]
        g = g[:d, :]
        if d > d_count:
            # the table's sublane padding (columns d_count..d-1) must stay
            # untouched: the slice above keeps the count row (index d_count)
            # inside g, which would otherwise feed a spurious Adam update
            # into the padding columns of every touched row (ADVICE r4 #1)
            row = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
            g = jnp.where(row < d_count, g, 0.0)
        m_new = jnp.where(touched, b1 * m_ref[r] + (1.0 - b1) * g, m_ref[r])
        v_new = jnp.where(touched, b2 * v_ref[r] + (1.0 - b2) * g * g, v_ref[r])
        delta = jnp.where(
            touched,
            -lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps),
            0.0,
        )
        table_out[r] = table_ref[r] + delta
        m_out[r] = m_new
        v_out[r] = v_new


def sorted_adam_update_packed(table, m, v, uids, gsum, lr, step,
                              b1, b2, eps, tc: int = TC, tb: int = 8):
    """LAZY-ADAM over PACKED [n_tiles, d, tr] table and moment tensors
    (``pallas_gather.pack`` layout, shared with the sweep-gather kernel).
    uids: [N] sorted int32, duplicates summed by the one-hot contraction;
    gsum: [N, D] raw per-occurrence grads in the same order. ``step`` is
    the GLOBAL step counter (0-based; bias correction uses t = step + 1 —
    the standard lazy-Adam choice, ``optim.sparse_adam`` docstring).
    Returns (table', m', v') updated in place via aliasing."""
    n_tiles, d, tr = table.shape
    uids_p, g_ops, n_chunks, d16 = _prep_stream(uids, gsum, tc, count_row=True)
    pos = _chunk_pos(uids_p, n_tiles, tr, tc, n_chunks)
    while n_tiles % tb:
        tb //= 2

    def c0_map(t, pos_ref):
        return (0, jnp.clip(pos_ref[t * tb] - 1, 0, n_chunks - 1))

    tile_spec = pl.BlockSpec((tb, d, tr), lambda t, *_: (t, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tb,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # uids (rare-path manual DMA)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(g_ops)
        + [pl.BlockSpec((d16, tc), c0_map)] * len(g_ops)  # grads chunk c0
        + [
            pl.BlockSpec((1, tc), c0_map),  # ids chunk c0
            tile_spec,  # table
            tile_spec,  # m
            tile_spec,  # v
        ],
        out_specs=[tile_spec, tile_spec, tile_spec],
        scratch_shapes=[pltpu.VMEM((1, tc), jnp.int32)]
        + [pltpu.VMEM((d16, tc), jnp.bfloat16)] * len(g_ops)
        + [pltpu.SemaphoreType.DMA((1 + len(g_ops),))],
    )
    t1 = (jnp.asarray(step, jnp.float32) + 1.0)
    sc = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** t1,
        1.0 - jnp.asarray(b2, jnp.float32) ** t1,
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)
    n_ops = len(g_ops)
    alias_base = 4 + 2 * n_ops  # pos, sc, uids, g_hbm*, g_blk*, ids_blk
    outs = pl.pallas_call(
        functools.partial(
            _adam_packed_kernel, b1=b1, b2=b2, eps=eps, n_chunks=n_chunks,
            n_ops=n_ops, tb=tb, tc=tc, d=d, d_count=gsum.shape[1],
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, d, tr), table.dtype),
            jax.ShapeDtypeStruct((n_tiles, d, tr), m.dtype),
            jax.ShapeDtypeStruct((n_tiles, d, tr), v.dtype),
        ],
        input_output_aliases={alias_base: 0, alias_base + 1: 1,
                              alias_base + 2: 2},
        interpret=_interpret(),
    )(pos, sc, uids_p.reshape(1, -1), *g_ops, *g_ops,
      uids_p.reshape(1, -1), table, m, v)
    return outs


def supported(table) -> bool:
    """Kernel applicability: 2-D [R, D] (tile-divisible rows) or packed 3-D
    table, on real TPU (or interpret mode for tests — on CPU the XLA paths
    are the implementation)."""
    ok_shape = (table.ndim == 2 and table.shape[0] % TR == 0) or (
        table.ndim == 3 and table.shape[-1] == TR
    )
    return ok_shape and (_INTERPRET or jax.default_backend() != "cpu")
