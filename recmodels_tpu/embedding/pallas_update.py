"""Fused sorted-scatter embedding update as a Pallas TPU kernel.

Why: XLA lowers scatter(-add) on TPU to a serialized dynamic-update-slice
loop (~100ns per updated row — measured in bench/profile_scatter.py: 10.6ms
for 106k row updates into a 2.6M x 16 table, identical for raw, hinted, and
segment_sum formulations). That made the optimizer update the dominant cost
of the whole train step.

Design (the "CSR sweep" that SparseCore implements in hardware):
  1. dedup_segment_sum gives SORTED unique row ids + summed grads;
  2. ``searchsorted`` over tile boundaries gives each table tile its
     contiguous slice of updates (scalar-prefetched);
  3. the kernel sweeps the table in column tiles (auto-pipelined
     BlockSpecs); each tile DMAs its update window (double-buffered across
     grid steps), expands it with a [TR, W] one-hot from iota-compare, and
     contracts on the MXU; then the Adagrad elementwise math — all in VMEM,
     written back in place (input_output_aliases).

Layout: the kernel operates on the TRANSPOSED view ``[D, R]``. XLA prefers
column-major ``{0,1}`` for the ``[R, D]`` tables (the gather's choice), and
a row-major transposed view is byte-identical to that — so wrapping the
kernel in ``table.T`` / ``.T`` lets layout assignment cancel the transposes
instead of materializing full-table relayout copies (which cost 8.8ms/step
in the first, row-major version of this kernel).

With TR tile rows == the update-window capacity, a tile can never receive
more than TR unique updates (dedup guarantees uniqueness) — no dropped
updates under any id distribution. Sentinel padding ids (>= num_rows) sort
past the last real tile; any landing in allocation padding carry zero grads
(dedup zero-fills invalid segments) and are no-ops.

Requires table rows % TR == 0 — EmbeddingCollection pads allocations to
ALLOC_MULTIPLE rows (logical vocab unchanged; pad rows are never gathered).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 512  # table rows per tile == max updates per tile (exactness bound)

_INTERPRET = False


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _adagrad_kernel(start_ref, lr_ref, uids_ref, ghi_ref, glo_ref, table_ref,
                    acc_ref, table_out, acc_out, ids_s, ghi_s, glo_s, sems, *,
                    eps):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    lr = lr_ref[0, 0]
    tr, w = ids_s.shape[2] - 128, ids_s.shape[2]

    def window_dmas(tile, slot):
        s0 = pl.multiple_of((start_ref[tile] // 128) * 128, 128)
        return (
            pltpu.make_async_copy(
                uids_ref.at[0, pl.ds(s0, w)], ids_s.at[slot, 0, :], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                ghi_ref.at[:, pl.ds(s0, w)], ghi_s.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                glo_ref.at[:, pl.ds(s0, w)], glo_s.at[slot], sems.at[slot, 2]
            ),
        )

    @pl.when(t == 0)
    def _():
        for dma in window_dmas(0, 0):
            dma.start()

    # prefetch next tile's window while this tile computes
    @pl.when(t + 1 < n_t)
    def _():
        for dma in window_dmas(t + 1, (t + 1) % 2):
            dma.start()

    slot = t % 2
    for dma in window_dmas(t, slot):
        dma.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (tr, w), 0)  # local table row
    ids_b = jnp.broadcast_to(ids_s[slot, 0:1, :], (tr, w))
    # No column-validity mask needed: ids are globally sorted and unique, so
    # window entries before this tile's range are < t*tr and entries after
    # it are >= (t+1)*tr — the equality below can only fire for this tile's
    # own updates (sentinel ids are INT32_MAX >> any row). Select in f32
    # layout (the i1 mask lives in 32-bit (8,128) tiling; Mosaic can't
    # relayout i1 straight to bf16 (16,128)), then cast for the MXU.
    onehot = jnp.where(ids_b == row + t * tr, 1.0, 0.0).astype(jnp.bfloat16)
    # g_t[d, r] = sum_w gsum_t[d, w] * onehot[r, w]. The grads arrive as a
    # bf16 hi/lo decomposition (hi + lo == f32 grad to ~2^-18 rel), so two
    # single-pass bf16 MXU dots recover near-f32 exactness — measured 2.3x
    # faster than one Precision.HIGHEST f32 dot (6 passes), and DEFAULT
    # f32 (1 truncated pass) was 5e-4 off.
    dims = (((1,), (1,)), ((), ()))
    g = jax.lax.dot_general(
        ghi_s[slot], onehot, dims, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        glo_s[slot], onehot, dims, preferred_element_type=jnp.float32
    )  # [D16, TR]

    g = g[: acc_ref.shape[0], :]  # drop sublane alignment padding (d16 -> d)
    acc_new = acc_ref[:] + g * g
    table_out[:] = table_ref[:] - lr * g / (jnp.sqrt(acc_new) + eps)
    acc_out[:] = acc_new


def sorted_adagrad_update(table, acc, uids, gsum, lr, eps, tr: int = TR):
    """Fused Adagrad over sorted unique updates, in place.

    table, acc: [R, D] with R % tr == 0. uids: [N] sorted int32 (sentinels
    >= R at the tail, zero gsum rows). gsum: [N, D]. Returns (table', acc').

    ``tr`` (table rows per tile) trades per-tile exactness capacity
    (dedup'd updates per tile can never exceed tr) against total work: the
    one-hot expansion costs O(R * (tr+128)) VPU compares and MXU FLOPs, so
    smaller tiles are cheaper — tr=256 measured 1.5x faster than tr=512 at
    the 2.6M-row bench table.
    """
    r, d = table.shape
    assert r % tr == 0, (r, tr)
    # DMA window: dynamic slice starts must be lane-aligned, so starts round
    # down to a 128 boundary; +128 margin keeps every window covering its
    # tile's full update slice.
    w = tr + 128
    n = uids.shape[0]
    n_tiles = r // tr
    # pad updates so every DMA window [s0, s0+w) is in bounds; pad the
    # transposed grad buffer's sublane dim to a multiple of 16 (Mosaic DMA
    # slices require tiling-aligned sublane shapes; bf16 tiles are (16,128)
    # — cheap here, O(batch) only). Then split f32 grads into a bf16 hi/lo
    # pair for the kernel's two single-pass MXU dots (see _adagrad_kernel).
    d16 = -(-d // 16) * 16
    uids_p = jnp.concatenate([uids, jnp.full((w,), jnp.iinfo(jnp.int32).max, jnp.int32)])
    gsum_t = jnp.concatenate([gsum, jnp.zeros((w, d), gsum.dtype)]).T  # [D, N+w]
    if d16 != d:
        gsum_t = jnp.pad(gsum_t, ((0, d16 - d), (0, 0)))
    ghi = gsum_t.astype(jnp.bfloat16)
    glo = (gsum_t - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
    # per-tile window starts: start[t] = #ids < t*tr. A histogram+cumsum
    # (vectorized segment_sum) — jnp.searchsorted lowers to a serialized
    # while-loop that cost 1.2ms/step at 5k tiles.
    tile_of = jnp.clip(uids // tr, 0, n_tiles).astype(jnp.int32)
    hist = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), tile_of, num_segments=n_tiles + 1
    )
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist[:n_tiles], dtype=jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, *_: (0, 0), memory_space=pltpu.SMEM),  # lr
            pl.BlockSpec(memory_space=pl.ANY),  # uids (windows DMA'd manually)
            pl.BlockSpec(memory_space=pl.ANY),  # grad hi bf16 (windows DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),  # grad lo bf16 (windows DMA'd)
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),  # table^T tile
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),  # acc^T tile
        ],
        out_specs=[
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
            pl.BlockSpec((d, tr), lambda t, *_: (0, t)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, w), jnp.int32),  # double-buffered id windows
            pltpu.VMEM((2, d16, w), jnp.bfloat16),  # grad hi windows
            pltpu.VMEM((2, d16, w), jnp.bfloat16),  # grad lo windows
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1, 1)
    table2_t, acc2_t = pl.pallas_call(
        functools.partial(_adagrad_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((d, r), table.dtype),
            jax.ShapeDtypeStruct((d, r), acc.dtype),
        ),
        input_output_aliases={5: 0, 6: 1},  # table/acc update in place
        interpret=_interpret(),
    )(start, lr_arr, uids_p.reshape(1, -1), ghi, glo, table.T, acc.T)
    return table2_t.T, acc2_t.T


def supported(table) -> bool:
    """Kernel applicability: 2-D table, tile-divisible rows, real TPU (or
    interpret mode for tests — on CPU the XLA paths are the implementation)."""
    return (
        table.ndim == 2
        and table.shape[0] % TR == 0
        and (_INTERPRET or jax.default_backend() != "cpu")
    )
