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
    tb = min(bsz, 1024)
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


def _cin_forward_dmajor(xk_dm, x0_dm, w):
    """xk_dm [B, D, Hk], x0_dm [B, D, m], w [Hn, Hk, m] -> (out [B,D,Hn], pool [B,Hn])."""
    b, d, hk = xk_dm.shape
    m = x0_dm.shape[2]
    hn = w.shape[0]
    # kernel requires lane-aligned Hn slices on real hardware
    aligned = hn % 128 == 0 or _interpret()
    rows = b * d
    tr = 256
    while (tr * m * hn + tr * hk + hk * m * hn) * 4 > 10 * 2**20 and tr > 8:
        tr //= 2
    if rows % tr or not aligned:
        out = ref.cin_layer(jnp.swapaxes(xk_dm, 1, 2), jnp.swapaxes(x0_dm, 1, 2), w)
        out_dm = jnp.swapaxes(out, 1, 2)
        return out_dm, jnp.sum(out_dm, axis=1)
    w2 = jnp.transpose(w, (1, 2, 0)).reshape(hk, m * hn)  # [Hk, m*Hn]
    out2 = pl.pallas_call(
        functools.partial(_cin_kernel, m=m, hn=hn),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hn), xk_dm.dtype),
        interpret=_interpret(),
    )(xk_dm.reshape(rows, hk), x0_dm.reshape(rows, m), w2)
    out = out2.reshape(b, d, hn)
    return out, jnp.sum(out, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _cin_layer_dm(xk_dm, x0_dm, w):
    out, _ = _cin_forward_dmajor(xk_dm, x0_dm, w)
    return out


def _cin_dm_fwd(xk_dm, x0_dm, w):
    out, _ = _cin_forward_dmajor(xk_dm, x0_dm, w)
    return out, (xk_dm, x0_dm, w)


def _cin_dm_bwd(res, g):
    xk, x0, w = res  # D-major [B,D,Hk], [B,D,m], [Hn,Hk,m]; g [B,D,Hn]
    gxk = jnp.einsum("bdn,nhi,bdi->bdh", g, w, x0)
    gx0 = jnp.einsum("bdn,nhi,bdh->bdi", g, w, xk)
    gw = jnp.einsum("bdn,bdh,bdi->nhi", g, xk, x0)
    return gxk, gx0, gw


_cin_layer_dm.defvjp(_cin_dm_fwd, _cin_dm_bwd)


def cin_layer(xk, x0, w):
    """Dispatch-compatible wrapper: H-major in/out ([B,Hk,D] etc.)."""
    out_dm = _cin_layer_dm(jnp.swapaxes(xk, 1, 2), jnp.swapaxes(x0, 1, 2), w)
    return jnp.swapaxes(out_dm, 1, 2)


def cin_stack(x0, ws):
    """Whole CIN in D-major: x0 [B, m, D], ws list of [H_next, H_prev, m]
    -> pools concat [B, sum(H)]. One transpose in, zero out (pools only)."""
    x0_dm = jnp.swapaxes(x0, 1, 2)
    xk_dm = x0_dm
    pools = []
    for w in ws:
        xk_dm = _cin_layer_dm(xk_dm, x0_dm, w)
        pools.append(jnp.sum(xk_dm, axis=1))
    return jnp.concatenate(pools, axis=1)


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
}
