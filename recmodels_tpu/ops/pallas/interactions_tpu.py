"""Fused Pallas TPU kernels for the interaction ops.

These replace the reference's MKL-backed BigDL tensor ops (SURVEY.md §2a
#10) on the compute-hot path. Design notes per kernel:

* ``cin_layer`` (the xDeepFM hot spot, SURVEY.md §7 hard part 5): works in
  **D-major layout** ``[B, D, H]``. For a batch tile, the Hadamard-outer
  tensor Z[(b,d), (h,i)] = xk[b,d,h]·x0[b,d,i] is built in VMEM
  (never HBM) and contracted on the MXU as one well-shaped matmul
  ``[(B_t·D), Hk·m] @ [Hk·m, Hn]``. The per-layer sum-pool over D is fused
  as a second output so the activation is read once.
* ``fm_pairwise`` / ``dcn_cross_stack``: VPU kernels; the DCN stack fuses
  ALL cross layers in one kernel so x_l never round-trips HBM between
  layers.
* All kernels carry a custom VJP: backward passes are expressed as einsums
  (XLA fuses them onto the MXU); forward recomputation is avoided by saving
  only the original inputs (O(batch·F·D) residuals).

Correctness: tests/test_pallas_kernels.py checks every kernel against the
jnp references in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recmodels_tpu.ops import interactions as ref

_INTERPRET = False  # flipped by tests on CPU


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def _cdiv(a, b):
    return -(-a // b)


# =========================================================== fm_pairwise
def _fm_kernel(e_ref, out_ref):
    e = e_ref[:]  # [TB, F, D]
    s = jnp.sum(e, axis=1)  # [TB, D]
    val = 0.5 * (jnp.sum(s * s, axis=1) - jnp.sum(e * e, axis=(1, 2)))
    out_ref[:] = val[:, None]


def _fm_forward(emb: jnp.ndarray) -> jnp.ndarray:
    b, f, d = emb.shape
    tb = min(b, 512)
    if b % tb:
        return ref.fm_pairwise(emb)  # ragged batch: reference path
    out = pl.pallas_call(
        _fm_kernel,
        grid=(b // tb,),
        in_specs=[pl.BlockSpec((tb, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), emb.dtype),
        interpret=_interpret(),
    )(emb)
    return out[:, 0]


@jax.custom_vjp
def fm_pairwise(emb):
    return _fm_forward(emb)


def _fm_fwd(emb):
    return _fm_forward(emb), emb


def _fm_bwd(emb, g):
    # d/d e_fd [0.5(s_d^2 - sum e^2)] = s_d - e_fd
    s = jnp.sum(emb, axis=1, keepdims=True)
    return ((s - emb) * g[:, None, None],)


fm_pairwise.defvjp(_fm_fwd, _fm_bwd)


# ======================================================= dcn cross stack
def _dcn_kernel(x0_ref, w_ref, b_ref, out_ref):
    x0 = x0_ref[:]  # [TB, d]
    xl = x0
    n_layers = w_ref.shape[0]
    for l in range(n_layers):  # static unroll: L is 2-4
        t = jnp.sum(xl * w_ref[l, :][None, :], axis=1, keepdims=True)  # [TB,1]
        xl = x0 * t + b_ref[l, :][None, :] + xl
    out_ref[:] = xl


def _dcn_forward(x0, w, b):
    bsz, d = x0.shape
    n_layers = w.shape[0]
    tb = min(bsz, 256)
    if bsz % tb:
        return _dcn_ref_stack(x0, w, b)
    return pl.pallas_call(
        _dcn_kernel,
        grid=(bsz // tb,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d), x0.dtype),
        interpret=_interpret(),
    )(x0, w, b)


def _dcn_ref_stack(x0, w, b):
    xl = x0
    for l in range(w.shape[0]):
        xl = ref.dcn_cross_layer(x0, xl, w[l], b[l])
    return xl


@jax.custom_vjp
def dcn_cross_stack(x0, w, b):
    """All L cross layers fused: x0 [B,d], w [L,d], b [L,d] -> x_L [B,d]."""
    return _dcn_forward(x0, w, b)


def _dcn_fwd(x0, w, b):
    return _dcn_forward(x0, w, b), (x0, w, b)


def _dcn_bwd(res, g):
    # recompute the (cheap, VPU-bound) forward chain for intermediates
    x0, w, b = res
    n_layers = w.shape[0]
    xs = [x0]
    xl = x0
    for l in range(n_layers):
        xl = ref.dcn_cross_layer(x0, xl, w[l], b[l])
        xs.append(xl)
    gx0 = jnp.zeros_like(x0)
    gw = jnp.zeros_like(w)
    gb = jnp.zeros_like(b)
    gxl = g
    for l in range(n_layers - 1, -1, -1):
        xl_in = xs[l]
        t = jnp.einsum("bd,d->b", xl_in, w[l])  # [B]
        gb = gb.at[l].add(jnp.sum(gxl, axis=0))
        gt = jnp.sum(gxl * x0, axis=1)  # [B]
        gx0 = gx0 + gxl * t[:, None]
        gw = gw.at[l].add(jnp.einsum("b,bd->d", gt, xl_in))
        gxl = gxl + gt[:, None] * w[l][None, :]
    gx0 = gx0 + gxl  # d x_0 through the initial xl = x0
    # note: gxl at loop end is dLoss/d x_0-as-chain-input
    return gx0, gw, gb


dcn_cross_stack.defvjp(_dcn_fwd, _dcn_bwd)


def dcn_cross_layer(x0, xl, w, b):
    """Single-layer API parity (dispatch name ``dcn_cross_layer``)."""
    return ref.dcn_cross_layer(x0, xl, w, b)


# ================================================================== CIN
#
# Layout strategy: the whole CIN block runs on flat ROW-MAJOR 2-D arrays
# with rows r = (example, dim) pairs. The only H-major <-> D-major
# boundaries are two tiny Pallas transpose kernels ([B, m, D] <-> [B, D, m]
# in VMEM, 0.03ms at b=8192 vs ~1.2ms for the XLA relayout copies they
# replace), and every matmul/einsum in between keeps {2,1,0} layouts so XLA
# inserts no transposes. This also frees the embedding gather to emit its
# fast row-major layout instead of the D-minor one the old 3-D form pinned.


def _transpose_minor2(x, tb_target=256):
    """[B, a, b] -> [B, b, a] as a Pallas VMEM transpose (jnp fallback on
    CPU / ragged batch)."""
    bsz, a, b = x.shape
    tb = min(bsz, tb_target)
    if bsz % tb or _interpret():
        return jnp.swapaxes(x, 1, 2)

    def kern(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)

    return pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[pl.BlockSpec((tb, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, b, a), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, b, a), x.dtype),
        interpret=_interpret(),
    )(x)


@jax.custom_vjp
def transpose_minor2(x):
    """Differentiable [B, a, b] -> [B, b, a]; vjp is the inverse transpose."""
    return _transpose_minor2(x)


transpose_minor2.defvjp(
    lambda x: (_transpose_minor2(x), None),
    lambda _, g: (_transpose_minor2(g),),
)


def _cin_kernel(xk_ref, x0_ref, w2_ref, out_ref, *, m: int, hn: int):
    """One row tile, fully 2D (rows = flattened (b, d) pairs).

    xk [TR, Hk], x0 [TR, m], w2 [Hk, m*Hn] (w transposed [Hk, m, Hn] then
    flattened) -> out [TR, Hn]:

        t = xk @ w2                                  (one big MXU matmul)
        out = Σ_i t[:, i·Hn:(i+1)·Hn] * x0[:, i:i+1] (static m-unrolled VPU)

    Mosaic-safety: no reshapes at all inside the kernel; the m-loop uses
    static lane-aligned slices (Hn % 128 == 0) and scalar-per-row broadcast.
    (Earlier formulations hit 'unsupported shape cast' on a minor-dim
    collapse and 'invalid relayout' on a major-dim split.)"""
    t = jnp.dot(xk_ref[:], w2_ref[:], preferred_element_type=jnp.float32)  # [TR, m*Hn]
    x0 = x0_ref[:]
    acc = t[:, 0:hn] * x0[:, 0:1]
    for i in range(1, m):
        acc = acc + t[:, i * hn : (i + 1) * hn] * x0[:, i : i + 1]
    out_ref[:] = acc.astype(out_ref.dtype)


def _cin_forward_2d(xk2, x02, w2):
    """Rows r = (b, d): xk2 [R, Hk], x02 [R, m], w2 FLAT [Hk, m*Hn]
    (``interactions.flatten_cin_w`` layout — the parameter is STORED this
    way so no per-step weight transpose exists) -> out [R, Hn]."""
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    # kernel requires lane-aligned Hn slices on real hardware
    aligned = hn % 128 == 0 or _interpret()
    tr = 256
    while (tr * m * hn + tr * hk + hk * m * hn) * 4 > 10 * 2**20 and tr > 8:
        tr //= 2
    if rows % tr or not aligned:
        # reference path (jnp): w3[h,i,n] is a FREE reshape of w2
        w3 = w2.reshape(hk, m, hn)
        t = jnp.einsum("rh,hin->rin", xk2, w3, preferred_element_type=jnp.float32)
        return jnp.einsum("rin,ri->rn", t, x02.astype(t.dtype)).astype(xk2.dtype)
    return pl.pallas_call(
        functools.partial(_cin_kernel, m=m, hn=hn),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hn), xk2.dtype),
        interpret=_interpret(),
    )(xk2, x02, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _cin_layer_2d(xk2, x02, w):
    return _cin_forward_2d(xk2, x02, w)


def _cin_2d_fwd(xk2, x02, w):
    return _cin_forward_2d(xk2, x02, w), (xk2, x02, w)


def _cin_bwd_kernel(g_ref, xk_ref, x0_ref, w2_ref, ones_ref,
                    gxk_ref, gx0_ref, gw_ref, wp_s, gw_s, *, m: int, hn: int):
    """All three CIN cotangents from ONE row tile, VMEM-resident, consuming
    the SAME flat weight layout w2 [Hk, m*Hn] the forward kernel uses (so
    no weight transpose exists anywhere in the step — the round-2 trace
    showed those transposes costing more async-DMA time than the matmuls).

    Per i (m-unrolled; w2_i = w2[:, i*Hn:(i+1)*Hn], an [Hk, Hn] slice):
      t1_i[r,h] = Σ_n g[r,n]·w2_i[h,n]           (NT dot on the MXU)
      gxk      += t1_i · x0[:, i]                 (VPU fma, f32 acc)
      q_i       = t1_i · xk                       (for gx0, see below)
      gw2[:, i·Hn:(i+1)·Hn] += (xk·x0_i)ᵀ @ g     (row-contraction dot,
                                                   accumulated in VMEM
                                                   SCRATCH across the grid,
                                                   written to HBM once on
                                                   the last step — a
                                                   constant-index output
                                                   block would round-trip
                                                   1.7MB × n_steps of HBM)
    then gx0 = concat(q_i) @ ONES with the constant block-ones matrix
    ONES[(i,h), j] = 1[i == j] (one dot replaces m per-lane row reductions).
    In XLA-einsum form the shared projection t1 is a [R, m·Hk] = 872MB HBM
    intermediate at the flagship shape — here it never leaves VMEM.
    """
    g = g_ref[:]  # [tr, Hn] bf16
    xk = xk_ref[:]  # [tr, Hk] bf16
    x0 = x0_ref[:]  # [tr, m] bf16
    step = pl.program_id(0)
    first = step == 0

    # Build wpT[n, (i·Hk+h)] = w2[h, i·Hn+n] ONCE, in VMEM, PRE-TRANSPOSED
    # so the t1 projection is a pure NN dot: an NT dot re-transposes its
    # loop-invariant RHS every tile (Mosaic cannot hoist out of a scratch
    # buffer — measured in bench/dot_orient_micro.py, round 4). Doing the
    # permute in XLA instead lowered as a {1,0}->{0,1} relayout + chunked
    # strided copies — 2.5ms/step of async DMA on a 1.7MB weight.
    @pl.when(first)
    def _():
        wp_s[:] = jnp.concatenate(
            [w2_ref[:, i * hn : (i + 1) * hn].T for i in range(m)], axis=1
        )

    # ONE NN dot for the whole projection (52 per-i [tr,128] dots measured
    # ~21% MXU efficiency; this shape is [tr,Hn]@[Hn,m·Hk] — full tiles),
    # lane-CHUNKED so the f32 accumulator transient is bounded at tr=512
    # (whole-width t1 at tr=512 is a 6.8MB f32 transient — VMEM overflow;
    # round-3 race: tr=512+2 chunks 4.18ms vs tr=256 unchunked 5.42ms)
    hk = xk.shape[1]
    n_chunks = 2 if (m * hk) % 2 == 0 else 1
    cw = (m * hk) // n_chunks
    t1_parts = [
        jnp.dot(
            g, wp_s[:, c * cw : (c + 1) * cw],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for c in range(n_chunks)
    ]
    t1 = (jnp.concatenate(t1_parts, axis=1) if n_chunks > 1
          else t1_parts[0])  # [tr, m·Hk], col (i·Hk + h)
    gxk = None
    q_parts = []
    z_parts = []
    for i in range(m):
        t1_i = t1[:, i * hk : (i + 1) * hk]
        x0_i = x0[:, i : i + 1]
        contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
        gxk = contrib if gxk is None else gxk + contrib
        q_parts.append(t1_i * xk)
        z_parts.append(xk * x0_i)
    gxk_ref[:] = gxk.astype(gxk_ref.dtype)
    q = jnp.concatenate(q_parts, axis=1)  # [tr, m·Hk] bf16
    gx0_ref[:] = jnp.dot(
        q, ones_ref[:], preferred_element_type=jnp.float32
    ).astype(gx0_ref.dtype)
    z = jnp.concatenate(z_parts, axis=1)  # [tr, m·Hk] bf16
    # gw accumulated TRANSPOSED [Hn, m·Hk]: the row-contraction dot
    # transposes its FIRST operand, so pass the narrow g (0.13MB) and keep
    # the wide z (3.4MB) untouched — wide-first relayouted ~1.7GB/step of
    # VREGs (round-4 measurement, bench/dot_orient_micro.py)
    gw_step = jax.lax.dot_general(
        g, z, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hn, m·Hk]

    @pl.when(first)
    def _():
        gw_s[:] = gw_step

    @pl.when(jnp.logical_not(first))
    def _():
        gw_s[:] += gw_step

    # emit gw DIRECTLY in the flat parameter layout (26 small [Hn,Hk]
    # block transposes + lane concat, once per call on the last step)
    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        hk = xk.shape[1]
        gw_ref[:] = jnp.concatenate(
            [gw_s[:, i * hk : (i + 1) * hk].T for i in range(m)], axis=1
        )


BWD_TR = 512  # rows per CIN-backward tile (feasible once t1 is lane-chunked)


def _cin_bwd_pallas(xk2, x02, w2, g):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    tr = BWD_TR
    # block-ones ONES[(i,h), j] = 1[i == j] (constant; folded by XLA)
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)
    gxk, gx0, gw2 = pl.pallas_call(
        functools.partial(_cin_bwd_kernel, m=m, hn=hn),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hk, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, hk), xk2.dtype),
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((hk, m * hn), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hn, m * hk), jnp.bfloat16),  # wpT (pre-transposed)
            pltpu.VMEM((hn, m * hk), jnp.float32),  # gw transposed accumulate
        ],
        interpret=_interpret(),
    )(g, xk2, x02, w2, ones_blk)
    return gxk, gx0, gw2.astype(w2.dtype)


def _cin_2d_bwd(res, g):
    xk2, x02, w2 = res  # [R,Hk], [R,m], flat [Hk, m*Hn]; g [R,Hn]
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    # Fused Pallas backward when the layer is MXU-aligned (CIN layers 2+ at
    # the flagship CIN(128,128) config): the shared g@W projection stays in
    # VMEM instead of becoming an 872MB HBM einsum intermediate, and gw is
    # emitted directly in the flat parameter layout.
    import os as _os
    # The fused Pallas backward (one VMEM-resident projection shared by all
    # three cotangents) is the DEFAULT for aligned bf16 layers since the
    # round-3 tr=512/lane-chunked-t1 rework: 4.18ms vs 7.46ms einsum
    # isolated, and in-step 919k vs 899k ex/s at the b=16384 flagship.
    # (The earlier tr=256 version lost in-step, 844k vs 875k — XLA overlaps
    # the einsum's HBM traffic with neighboring ops, so the kernel must win
    # by a margin bigger than the lost overlap.) RECMODELS_CIN_BWD_EINSUM=1
    # forces the einsum path; both are covered by the same parity tests.
    if (hk % 128 == 0 and hn % 128 == 0 and m <= 128 and rows % BWD_TR == 0
            and xk2.dtype == jnp.bfloat16
            and not _os.environ.get("RECMODELS_CIN_BWD_EINSUM")):
        return _cin_bwd_pallas(xk2, x02, w2, g)
    # einsum path (also: layer 1's Hk = m = 26, misaligned lanes). w3[h,i,n]
    # is a FREE reshape of the flat parameter — every einsum below is
    # expressed against it so NO weight transpose is ever materialized.
    # NOTE (r3, measured): forcing the contraction order with explicit 2-D
    # dots (shared [R, hk*m] projection + row-contraction gw) regressed
    # 897k -> 725k ex/s at the flagship — XLA's own 3-operand einsum
    # scheduling beats explicit materialization here, same conclusion as
    # the round-1 "do not hoist g @ W" note. Leave opt_einsum alone.
    w3 = w2.reshape(hk, m, hn)
    gxk = jnp.einsum("rn,hin,ri->rh", g, w3, x02)
    gx0 = jnp.einsum("rn,hin,rh->ri", g, w3, xk2)
    gw3 = jnp.einsum("rn,rh,ri->hin", g, xk2, x02)
    return gxk, gx0, gw3.reshape(hk, m * hn).astype(w2.dtype)


_cin_layer_2d.defvjp(_cin_2d_fwd, _cin_2d_bwd)


# ============================================= fused 2-layer CIN stack
#
# The flagship CIN(128,128) runs the WHOLE stack as one forward and one
# backward Mosaic kernel (round 4). Two structural ideas:
#
# 1. PAIR-FIRST layer 1: m = 26 < H1 = 128, so building the pair-product
#    tensor P[r,(h,i)] = x0[r,h]·x0[r,i] FIRST (m² = 676 lanes, padded to
#    768) and contracting x1 = P @ W1p (W1p[(h,i),n] = w3[h,i,n] — a FREE
#    row-major reshape of the stored flat [m, m·H1] weight) does ~5x less
#    elementwise work than projection-then-fold (fold width m·H1 = 3328),
#    and turns the L1 backward into two wide muls + small dots instead of
#    the einsum path's [m, m, R] HBM intermediate (354MB at the flagship).
# 2. All expansions ride ONE-HOT MXU DOTS (e1 = x0@EA, e2 = x0@EB with
#    EA[h,(h,i)] = EB[i,(h,i)] = 1): the micro race
#    (bench/cin_bwd_micro.py) showed a 436M-FLOP dot adds ~0.04ms over the
#    pipeline floor (fully overlapped with DMA) while 26 per-row-scalar
#    lane-broadcast muls cost ~1.3ms — dots are the cheap way to broadcast.
#
# Layer 2 keeps the production t1/fold formulation (H1 = H2 makes
# pair-first neutral there; the e-form race in bench/cin_bwd_r4b.py lost).
# Measured isolated at the b=16k flagship shape: fwd 2.69ms vs 3.04ms
# (2 kernels + XLA pools), bwd 6.55ms vs 8.31ms (autodiff composition).
# x2, both pool reductions, and the pool-grad broadcasts never exist in
# HBM.

_CIN2_TR = 512  # support granularity (rows % 512); kernels take 1024 when it fits
# tr=1024 measured best for BOTH kernels post-Q-form (in-step ablation:
# 512/512 13.71ms, 1024/512 13.61, 512/1024 13.56, 1024/1024 13.46 —
# the Q-form shrank per-tile transients enough that the round-5 'tr1024
# neutral' verdict no longer holds). Env overrides for racing.
import os as _os
_CIN2_FWD_TR = int(_os.environ.get("RECMODELS_CIN2_FWD_TR", 0))
_CIN2_BWD_TR = int(_os.environ.get("RECMODELS_CIN2_BWD_TR", 0))
_CIN2_VMEM = 64 * 2**20


def _cin2_pick_tr(override: int, rows: int, d: int, best: int = 1024) -> int:
    # fwd best 1024, bwd best 2048 (in-step ablation at the flagship:
    # fwd 2048 regressed 13.46 -> 13.71ms, bwd 2048 13.46 -> 13.41,
    # bwd 4096 exceeds the 64MB scoped VMEM)
    if override:
        return override
    tr = best
    while tr > _CIN2_TR and (rows % tr or tr % d):
        tr //= 2
    return tr if rows % tr == 0 and tr % d == 0 else _CIN2_TR


def _cin2_supported(x02, w2s, d) -> bool:
    if _interpret() or len(w2s) != 2 or x02.dtype != jnp.bfloat16:
        return False
    rows, m = x02.shape
    h1 = w2s[0].shape[1] // m
    h2 = w2s[1].shape[1] // m
    return (
        w2s[0].shape[0] == m
        and w2s[1].shape[0] == h1
        and h1 % 128 == 0
        and h2 % 128 == 0
        and m <= 128
        and _CIN2_TR % d == 0
        and rows % _CIN2_TR == 0
    )


@functools.lru_cache(maxsize=4)
def _cin2_onehots_np(m: int):
    """EA[h,(h,i)] = 1, EB[i,(h,i)] = 1 (pair expansion); OA[(h,i),j] =
    1[h==j], OB[(h,i),j] = 1[i==j] (pair folding). Pairs h-major, lanes
    padded to a 128 multiple. Cached as NUMPY (device constants built per
    trace — caching traced arrays would leak tracers); XLA folds them."""
    import numpy as np

    mp = -(-m * m // 128) * 128
    ea = np.zeros((m, mp), np.float32)
    eb = np.zeros((m, mp), np.float32)
    for h in range(m):
        for i in range(m):
            ea[h, h * m + i] = 1.0
            eb[i, h * m + i] = 1.0
    return ea, eb, ea.T.copy(), eb.T.copy()


def _cin2_onehots(m: int):
    return tuple(jnp.asarray(a, jnp.bfloat16) for a in _cin2_onehots_np(m))


def _w1_pairs(w1_flat, m, h1, mp):
    """Stored flat [m, m·H1] -> pairs [mp, H1]. The reshape is free (row-
    major contiguity preserved: (h, i·H1+n) -> (h·m+i, n)); only the
    zero-pad to mp rows copies."""
    wp = w1_flat.reshape(m * m, h1)
    return jnp.concatenate(
        [wp, jnp.zeros((mp - m * m, h1), wp.dtype)], axis=0
    )


@functools.lru_cache(maxsize=4)
def _dsum_onehot_np(nb: int, tr: int, d: int):
    """DS[b, r] = 1[r//d == b] — the narrow-first example-pooling one-hot
    (cached as numpy; XLA folds the device constant)."""
    import numpy as np

    ds = np.zeros((nb, tr), np.float32)
    for r in range(tr):
        ds[r // d, r] = 1.0
    return ds


def _cin2_fwd_call(x02, w1, w2, d):
    """Pair-pool (Q) formulation (round 5, bench/cin_r5d.py).

    x2 never leaves the kernel, so the 218M-MAC t2 projection + m-term
    fold existed ONLY to produce p2. Reassociating the pool to example
    rank:

        p2[b,n] = sum_{(j,k)} Q[b,(j,k)] * W2R[(j,k),n]
        Q[b,(j,k)] = sum_d x0[(b,d),j] * x1[(b,d),k]

    Q rides a narrow-first one-hot d-sum dot (54.5M MAC/tile) over the
    pair stream, p2 one example-rank dot (13.6M), W2R[(j,k),n] =
    w2[k,(j,n)] a row-concat of w2's column blocks built once in scratch.
    Forward inventory 290M -> ~140M MAC/tile and the fold VPU is gone.

    Q is EMITTED ([B, m*h1] bf16; 109MB at the flagship, 0.13ms write):
    the backward's gw2 then collapses to an example-rank XLA einsum
    (7 GMAC vs 218M MAC/tile in-kernel) — fwd+bwd isolated 7.71 ->
    6.50ms, with p2/gw2 at the SAME f32-oracle distance as the fold form
    (p2 mean err 0.163 vs 0.175; the reassociation is not a precision
    trade)."""
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    mp = -(-m * m // 128) * 128
    tr = _cin2_pick_tr(_CIN2_FWD_TR, rows, d)
    nb = tr // d
    ea, eb, _, _ = _cin2_onehots(m)
    w1p = _w1_pairs(w1, m, h1, mp)
    ds = jnp.asarray(_dsum_onehot_np(nb, tr, d), jnp.bfloat16)

    def kern(x0_ref, w1p_ref, w2_ref, ea_ref, eb_ref, ds_ref,
             x1_ref, p1_ref, p2_ref, q_ref, w2r_s):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            # W2R[(j,k), n] = w2[k, (j,n)]: row-concat of w2's column
            # blocks — no transposes
            w2r_s[:] = jnp.concatenate(
                [w2_ref[:, j * h2 : (j + 1) * h2] for j in range(m)],
                axis=0,
            )

        x0 = x0_ref[:]
        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x1 = jnp.dot(e1 * e2, w1p_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
        x1_ref[:] = x1
        # pair stream z[r,(j,k)] = x0[r,j]*x1[r,k]; the d-sum dot
        # accumulates its bf16 products in f32 (the fold-accumulation
        # precision rule, ADVICE r4 #2, carries over: Q's 16-term sums and
        # p2's 3328-term dot both accumulate f32)
        z = jnp.concatenate(
            [x1 * x0[:, j : j + 1] for j in range(m)], axis=1
        )
        q = jnp.dot(ds_ref[:], z, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        q_ref[:] = q
        p2_ref[:] = jnp.dot(
            q, w2r_s[:], preferred_element_type=jnp.float32
        ).astype(p2_ref.dtype)
        p1_ref[:] = jnp.sum(x1.reshape(nb, d, h1).astype(jnp.float32), axis=1
                            ).astype(p1_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tr), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, m * h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, h2), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, m * h1), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((m * h1, h2), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_CIN2_VMEM),
    )(x02, w1p, w2, ea, eb, ds)


def _cin2_bwd_call(x02, x1, w1, w2, q, g1p, g2p, d):
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    mp = -(-m * m // 128) * 128
    tr = _cin2_pick_tr(_CIN2_BWD_TR, rows, d, best=2048)
    nb = tr // d
    ea, eb, oa, ob = _cin2_onehots(m)
    w1pt = _w1_pairs(w1, m, h1, mp).T  # [h1, mp]: NN orientation for gp
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), h1, axis=0)

    def kern(g1p_ref, g2p_ref, q_ref, x0_ref, x1_ref, w2_ref, w1pt_ref,
             ea_ref, eb_ref, oa_ref, ob_ref, ones_ref,
             gx0_ref, gw1_ref, gw2_ref, wp_s, gw1_s, gw2_s):
        x0 = x0_ref[:]
        xk = x1_ref[:]
        step = pl.program_id(0)
        first = step == 0

        @pl.when(first)
        def _():
            # wpT[n, (i,h)] = w3[h,i,n], PRE-transposed so the t1
            # projection is a pure NN dot — an NT dot re-transposes its
            # loop-invariant RHS every tile (Mosaic can't hoist out of a
            # scratch buffer)
            wp_s[:] = jnp.concatenate(
                [w2_ref[:, i * h2 : (i + 1) * h2].T for i in range(m)],
                axis=1,
            )

        # pool grads expand to rows in VMEM (each example's d rows share it)
        g1 = jnp.broadcast_to(g1p_ref[:].reshape(nb, 1, h1), (nb, d, h1)
                              ).reshape(tr, h1)

        # ---- layer-2 backward (t1/fold formulation, EXAMPLE-RANK t1) ----
        # g2 is broadcast over each example's d dim-rows, so the t1
        # projection runs at example rank (nb rows) and expands to rows by
        # the same sublane broadcast as g2/g1 — per-row t1 values are
        # BIT-identical (same vectors dotted), 218M -> 13.6M MAC/tile, and
        # the f32 transient shrinks 16x so the round-3 lane-chunking is
        # gone. Isolated 5.93 -> 5.49ms (bench/cin_bwd_r5c.py; the same
        # race killed b-rank gw2 forms — both a VPU d-sum and a one-hot
        # d-sum dot LOST ~0.6-1.7ms to scheduling, so gw2 stays row-rank).
        t1p = jnp.dot(
            g2p_ref[:], wp_s[:], preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [nb, m*h1]
        t1 = jnp.broadcast_to(
            t1p.reshape(nb, 1, m * h1), (nb, d, m * h1)
        ).reshape(tr, m * h1)
        gx1 = None
        q_parts = []
        for i in range(m):
            t1_i = t1[:, i * h1 : (i + 1) * h1]
            x0_i = x0[:, i : i + 1]
            contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
            gx1 = contrib if gx1 is None else gx1 + contrib
            q_parts.append(t1_i * xk)
        gx1 = (gx1 + g1.astype(jnp.float32)).astype(jnp.bfloat16)
        qq = jnp.concatenate(q_parts, axis=1)
        gx0_a = jnp.dot(qq, ones_ref[:], preferred_element_type=jnp.float32)
        # gw2 at example rank over the forward's saved pair-pool Q
        # (bench/cin_r5d.py): 218M -> 13.6M MAC/tile. The XLA-einsum form
        # of the same contraction regressed the step 0.55ms in-step — its
        # bulk Q reads doubled the packed update kernel's sweep time; as a
        # pipelined per-tile block input the traffic overlaps like any
        # other kernel operand.
        gw2_step = jax.lax.dot_general(
            g2p_ref[:], q_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- layer-1 backward (pair-first) ----
        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        gp = jnp.dot(  # NN against the pre-transposed [h1, mp] weight
            gx1, w1pt_ref[:], preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        gx0_b = (
            jnp.dot(gp * e2, oa_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(gp * e1, ob_ref[:], preferred_element_type=jnp.float32)
        )
        gw1_step = jax.lax.dot_general(
            gx1, e1 * e2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [h1, mp] (transposed accumulate, same reason as gw2)
        gx0_ref[:] = (gx0_a + gx0_b).astype(gx0_ref.dtype)

        @pl.when(first)
        def _():
            gw1_s[:] = gw1_step
            gw2_s[:] = gw2_step

        @pl.when(jnp.logical_not(first))
        def _():
            gw1_s[:] += gw1_step
            gw2_s[:] += gw2_step

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw1_ref[:] = gw1_s[:].T
            gw2_ref[:] = jnp.concatenate(
                [gw2_s[:, i * h1 : (i + 1) * h1].T for i in range(m)], axis=1
            )

    gx0, gw1p, gw2 = pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((nb, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, m * h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((mp, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, m * h2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h2, m * h1), jnp.bfloat16),  # wpT (pre-transposed)
            pltpu.VMEM((h1, mp), jnp.float32),   # gw1 transposed accumulate
            pltpu.VMEM((h2, m * h1), jnp.float32),  # gw2 transposed accumulate
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_CIN2_VMEM),
    )(g1p, g2p, q, x02, x1, w2, w1pt, ea, eb, oa, ob, ones_blk)
    # pairs-layout gw back to the stored flat layout (free reshape of the
    # unpadded rows)
    gw1 = gw1p[: m * m, :].reshape(m, m * h1)
    return gx0, gw1.astype(w1.dtype), gw2.astype(w2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cin2_fused(x02, w1, w2, d):
    x1, p1, p2, q = _cin2_fwd_call(x02, w1, w2, d)
    return p1, p2


def _cin2_fused_fwd(x02, w1, w2, d):
    x1, p1, p2, q = _cin2_fwd_call(x02, w1, w2, d)
    return (p1, p2), (x02, x1, w1, w2, q)


def _cin2_fused_bwd(d, res, gs):
    x02, x1, w1, w2, q = res
    g1p, g2p = gs
    gx0, gw1, gw2 = _cin2_bwd_call(
        x02, x1, w1, w2, q,
        g1p.astype(jnp.bfloat16), g2p.astype(jnp.bfloat16), d,
    )
    return gx0, gw1, gw2


_cin2_fused.defvjp(_cin2_fused_fwd, _cin2_fused_bwd)


def cin_layer(xk, x0, w):
    """Dispatch-compatible wrapper: H-major in/out ([B,Hk,D] etc.),
    reference 3-D weight [Hn, Hk, m] (flattened at call — compat/test path,
    not the flagship training path)."""
    b, hk, d = xk.shape
    m = x0.shape[1]
    xk2 = transpose_minor2(xk).reshape(b * d, hk)
    x02 = transpose_minor2(x0).reshape(b * d, m)
    out2 = _cin_layer_2d(xk2, x02, ref.flatten_cin_w(w))
    return transpose_minor2(out2.reshape(b, d, w.shape[0]))


def cin_stack_dm_flat(x0_dm, w2s):
    """CIN from an already-D-major field matrix with FLAT kernel-native
    weights: x0_dm [B, D, m], w2s list of [H_prev, m*H_next] -> pools
    concat [B, sum(H)]. Zero transposes of activations OR weights.

    The 2-layer aligned bf16 case (the CIN(128,128) flagship) takes the
    fully-fused stack kernels (``_cin2_fused`` below): one forward kernel
    (x0 -> x1, pool1, pool2 — x2 and both pool reductions never touch HBM)
    and one backward kernel (pool grads -> gx0, gw1, gw2 — no [B,D,H]
    pool-grad broadcasts, no L1 einsum intermediate)."""
    b, d, m = x0_dm.shape
    x02 = x0_dm.reshape(b * d, m)
    if _cin2_supported(x02, w2s, d):
        p1, p2 = _cin2_fused(x02, w2s[0], w2s[1], d)
        return jnp.concatenate([p1, p2], axis=1)
    xk2 = x02
    pools = []
    for w2 in w2s:
        hn = w2.shape[1] // m
        xk2 = _cin_layer_2d(xk2, x02, w2)
        pools.append(jnp.sum(xk2.reshape(b, d, hn), axis=1))
    return jnp.concatenate(pools, axis=1)


def cin_stack_flat(x0, w2s):
    """``cin_stack`` with flat weights: x0 [B, m, D] H-major in."""
    return cin_stack_dm_flat(transpose_minor2(x0), w2s)


def cin_stack_dm(x0_dm, ws):
    """CIN from a D-major field matrix, reference 3-D weights (flattened at
    call — compat path)."""
    return cin_stack_dm_flat(x0_dm, [ref.flatten_cin_w(w) for w in ws])


def cin_stack(x0, ws):
    """Whole CIN on flat (b, d) rows: x0 [B, m, D], reference 3-D weights
    (flattened at call — compat path). One Pallas VMEM transpose in, zero
    out (pools reduce over D)."""
    return cin_stack_dm(transpose_minor2(x0), ws)


# ------------------------------------------------- fused-row fanout
def _split_fused_fwd_impl(full, emb_dim: int):
    if _interpret():
        x_dm = jnp.swapaxes(full[..., :emb_dim], 1, 2)
        ws = jnp.sum(full[..., emb_dim].astype(jnp.float32), axis=1)
        return x_dm, ws
    bsz, m, dp1 = full.shape
    tb = min(bsz, 256)
    if bsz % tb:
        x_dm = jnp.swapaxes(full[..., :emb_dim], 1, 2)
        ws = jnp.sum(full[..., emb_dim].astype(jnp.float32), axis=1)
        return x_dm, ws

    # The pallas_call works on 2-D FLAT views ([B·m, D+1] in, [B·D, m] out):
    # a 3-D {2,1,0} operand spec forced XLA to relayout the gather-take's
    # natural row-major [N, D+1] output through a {1,0}->{0,1} copy, a
    # {1,0,2} reshape and a {2,1,0} copy (~0.8ms/step at b=16k, round-4
    # trace); the flat views are BITCASTS of the same bytes, so the take
    # feeds the kernel directly and the outputs bitcast back to the public
    # 3-D shapes.
    def kern(x_ref, xdm_ref, ws_ref):
        x = x_ref[:].reshape(tb, m, dp1)
        xdm_ref[:] = jnp.swapaxes(x[:, :, :emb_dim], 1, 2).reshape(
            tb * emb_dim, m
        )
        ws_ref[:] = jnp.sum(x[:, :, emb_dim].astype(jnp.float32), axis=1,
                            keepdims=True)

    x2d, ws = pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[pl.BlockSpec((tb * m, dp1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tb * emb_dim, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bsz * emb_dim, m), full.dtype),
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        ),
        # default scoped VMEM (16MB) overflows at batch >= 24,576 — this was
        # round 4's mysterious "remote compile helper crash" at large batch
        # (the AOT error names this kernel's stack allocation: 18.39M at
        # b=24,576). Raise the limit ONLY when needed: an unconditional
        # 64MB limit changed Mosaic's scheduling for the b=16,384 program
        # too and cost 3ms/step (1.044M -> 874k ex/s, round-5 measured).
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20)}
            if bsz > 16384 else {}
        ),
        interpret=_interpret(),
    )(full.reshape(bsz * m, dp1))
    # ws must be rank-1 [B] like the reference/interpret paths: a (B, 1)
    # wide_sum broadcast against [B] terms silently builds (B, B) logits
    # (bug shipped in round 1's TPU bench — CPU lanes never hit this branch)
    return x2d.reshape(bsz, emb_dim, m), ws[:, 0]


def _split_fused_bwd_impl(g_dm, g_ws, dtype, emb_dim: int):
    bsz, d, m = g_dm.shape
    tb = min(bsz, 256)
    if _interpret() or bsz % tb:
        g_emb = jnp.swapaxes(g_dm, 1, 2).astype(dtype)
        g_wide = jnp.broadcast_to(
            g_ws.reshape(bsz, 1, 1), (bsz, m, 1)
        ).astype(dtype)
        return jnp.concatenate([g_emb, g_wide], axis=2)

    # 2-D flat views for the same layout reason as the forward (the output
    # feeds the grad-permute take, which wants plain row-major [N, D+1])
    def kern(gdm_ref, gws_ref, out_ref):
        g3 = gdm_ref[:].reshape(tb, d, m)
        g_emb = jnp.swapaxes(g3, 1, 2).astype(out_ref.dtype)
        g_w = jnp.broadcast_to(
            gws_ref[:][:, :, None], (tb, m, 1)
        ).astype(out_ref.dtype)
        out_ref[:] = jnp.concatenate([g_emb, g_w], axis=2).reshape(
            tb * m, d + 1
        )

    out2d = pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[
            pl.BlockSpec((tb * d, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb * m, d + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * m, d + 1), dtype),
        **(
            {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20)}
            if bsz > 16384 else {}
        ),
        interpret=_interpret(),
    )(g_dm.reshape(bsz * d, m), g_ws.reshape(bsz, 1))
    return out2d.reshape(bsz, m, d + 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def split_fused_rows(full, emb_dim: int):
    """Fanout for wide-fused embedding rows [B, m, D+1] -> (x_dm [B, D, m],
    wide_sum [B] f32). One Pallas kernel so the gather feeding it keeps its
    fast row-major output layout (a D-minor gather layout cost 1.6ms extra
    at 213k rows), and the slice/cast/reduce boundary ops fold into VMEM."""
    return _split_fused_fwd_impl(full, emb_dim)


def _split_fused_fwd(full, emb_dim):
    return _split_fused_fwd_impl(full, emb_dim), None


def _split_fused_bwd(emb_dim, _res, gs):
    g_dm, g_ws = gs
    # primal rows share the vector cotangent's dtype (bf16 or f32)
    return (_split_fused_bwd_impl(g_dm, g_ws, g_dm.dtype, emb_dim),)


split_fused_rows.defvjp(_split_fused_fwd, _split_fused_bwd)


# ======================================================== pnn products
def pnn_inner_products(emb):
    """Gram upper triangle; batched [F,D]x[D,F] matmuls map to MXU well via
    XLA already — reuse reference math under the dispatch name."""
    return ref.pnn_inner_products(emb)


def pnn_outer_product(emb):
    return ref.pnn_outer_product(emb)


# Registered on TPU. Only the MXU-heavy CIN runs as a Pallas kernel: the
# FM/DCN/PNN interaction patterns are elementwise+reduce chains that XLA
# already fuses into single optimal VPU kernels — a hand kernel buys nothing
# there (measured; and each Mosaic compile costs minutes via this
# environment's remote-compile tunnel). The Pallas implementations above
# remain covered by interpret-mode tests as scaffolding for future tuning.
KERNELS = {
    "cin_layer": cin_layer,
}

# extra fused entry points (not 1:1 with reference ops)
FUSED = {
    "cin_stack": cin_stack,
    "cin_stack_dm": cin_stack_dm,
    "cin_stack_flat": cin_stack_flat,
    "cin_stack_dm_flat": cin_stack_dm_flat,
    "split_fused_rows": split_fused_rows,
}
