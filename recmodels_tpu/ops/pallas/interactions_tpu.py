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

    # Build wp[(i·Hk+h), n] = w2[h, i·Hn+n] ONCE, in VMEM (sublane concat of
    # the w2 lane-slices). Doing this permute in XLA instead lowered as a
    # {1,0}->{0,1} relayout + chunked strided copies — 2.5ms/step of async
    # DMA on a 1.7MB weight, the exact pathology this kernel exists to kill.
    @pl.when(first)
    def _():
        wp_s[:] = jnp.concatenate(
            [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
        )

    # ONE NT dot for the whole projection (52 per-i [tr,128] dots measured
    # ~21% MXU efficiency; this shape is [tr,Hn]x[m·Hk,Hn]ᵀ — full tiles),
    # lane-CHUNKED so the f32 accumulator transient is bounded at tr=512
    # (whole-width t1 at tr=512 is a 6.8MB f32 transient — VMEM overflow;
    # round-3 race: tr=512+2 chunks 4.18ms vs tr=256 unchunked 5.42ms)
    hk = xk.shape[1]
    n_chunks = 2 if (m * hk) % 2 == 0 else 1
    cw = (m * hk) // n_chunks
    t1_parts = [
        jax.lax.dot_general(
            g, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
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
    gw_step = jax.lax.dot_general(
        z, g, (((0,), (0,)), ((), ())),  # row contraction: zᵀ @ g
        preferred_element_type=jnp.float32,
    )  # [m·Hk, Hn]

    @pl.when(first)
    def _():
        gw_s[:] = gw_step

    @pl.when(jnp.logical_not(first))
    def _():
        gw_s[:] += gw_step

    # emit gw DIRECTLY in the flat parameter layout (lane concat in VMEM,
    # once per call) — the XLA-side un-permute had the same relayout cost
    # as the wp permute above
    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        hk = xk.shape[1]
        gw_ref[:] = jnp.concatenate(
            [gw_s[i * hk : (i + 1) * hk, :] for i in range(m)], axis=1
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
            pltpu.VMEM((m * hk, hn), jnp.bfloat16),  # wp (permuted weight)
            pltpu.VMEM((m * hk, hn), jnp.float32),  # gw accumulator
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
    concat [B, sum(H)]. Zero transposes of activations OR weights."""
    b, d, m = x0_dm.shape
    x02 = x0_dm.reshape(b * d, m)
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

    def kern(x_ref, xdm_ref, ws_ref):
        x = x_ref[:]
        xdm_ref[:] = jnp.swapaxes(x[:, :, :emb_dim], 1, 2)
        ws_ref[:] = jnp.sum(x[:, :, emb_dim].astype(jnp.float32), axis=1,
                            keepdims=True)

    x_dm, ws = pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[pl.BlockSpec((tb, m, dp1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tb, emb_dim, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bsz, emb_dim, m), full.dtype),
            jax.ShapeDtypeStruct((bsz, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(full)
    # ws must be rank-1 [B] like the reference/interpret paths: a (B, 1)
    # wide_sum broadcast against [B] terms silently builds (B, B) logits
    # (bug shipped in round 1's TPU bench — CPU lanes never hit this branch)
    return x_dm, ws[:, 0]


def _split_fused_bwd_impl(g_dm, g_ws, dtype, emb_dim: int):
    bsz, d, m = g_dm.shape
    tb = min(bsz, 256)
    if _interpret() or bsz % tb:
        g_emb = jnp.swapaxes(g_dm, 1, 2).astype(dtype)
        g_wide = jnp.broadcast_to(
            g_ws.reshape(bsz, 1, 1), (bsz, m, 1)
        ).astype(dtype)
        return jnp.concatenate([g_emb, g_wide], axis=2)

    def kern(gdm_ref, gws_ref, out_ref):
        g_emb = jnp.swapaxes(gdm_ref[:], 1, 2).astype(out_ref.dtype)
        g_w = jnp.broadcast_to(
            gws_ref[:][:, :, None], (tb, m, 1)
        ).astype(out_ref.dtype)
        out_ref[:] = jnp.concatenate([g_emb, g_w], axis=2)

    return pl.pallas_call(
        kern,
        grid=(bsz // tb,),
        in_specs=[
            pl.BlockSpec((tb, d, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, m, d + 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, d + 1), dtype),
        interpret=_interpret(),
    )(g_dm, g_ws.reshape(bsz, 1))


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
