#!/usr/bin/env python
"""Round-4 prototype: the ENTIRE CIN(128,128) stack as ONE forward kernel
and ONE backward kernel over flat (example, dim) rows.

Forward, per row tile (tr rows, D | tr):
    t1 = x0 @ w1                 [tr, m*h1]   (45M FLOP dot)
    x1 = fold_m(t1, x0)          [tr, h1]     (m-unrolled VPU)
    t2 = x1 @ w2                 [tr, m*h2]   (436M FLOP dot)
    x2 = fold_m(t2, x0)          [tr, h2]
    pool1/pool2: sum x1/x2 over each example's D consecutive rows
outputs: x1 (backward residual), pool1, pool2 [tr/D, h] blocks.
x2 NEVER exists in HBM; pools come out reduced (no XLA-side [B,D,h] reads);
the backward consumes pool grads [B, h] directly (no broadcast
materialization of g2 to [R, h]).

Backward, per row tile (g1p/g2p are POOL grads, one row per example):
    g2 = expand_D(g2p); g1 = expand_D(g1p)   (sublane broadcast)
    L2 (current production formulation): t1b = g2 @ wp2^T chunked,
       gx1 = fold + g1, q/z -> gx0_a, gw2
    L1 (u-form, xk == x0): u = lane_expand_i(x0) * tile(gx1... ) wait -
       u[r,(i,n)] = x0[r,i] * gx1[r,n]; gx0_b = u @ w1sym^T; gw1 = x0^T @ u
    gx0 = gx0_a + gx0_b
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.ops.pallas import interactions_tpu as K
from profile_cin import timeit

B, D, M, H1, H2 = 16384, 16, 26, 128, 128
R = B * D
VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _fold(t, x0, h, m):
    acc = t[:, 0:h] * x0[:, 0:1]
    for i in range(1, m):
        acc = acc + t[:, i * h : (i + 1) * h] * x0[:, i : i + 1]
    return acc


def fused_fwd(x02, w1, w2, tr=512):
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    nb = tr // D  # examples per tile

    def kern(x0_ref, w1_ref, w2_ref, x1_ref, p1_ref, p2_ref):
        x0 = x0_ref[:]
        t1 = jnp.dot(x0, w1_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
        x1 = _fold(t1, x0, h1, m)
        x1_ref[:] = x1
        t2 = jnp.dot(x1, w2_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
        x2 = _fold(t2, x0, h2, m)
        p1_ref[:] = jnp.sum(
            x1.reshape(nb, D, h1).astype(jnp.float32), axis=1
        ).astype(p1_ref.dtype)
        p2_ref[:] = jnp.sum(
            x2.reshape(nb, D, h2).astype(jnp.float32), axis=1
        ).astype(p2_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // D, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // D, h2), x02.dtype),
        ],
        compiler_params=VMEM,
    )(x02, w1, w2)


def fused_bwd(x02, x1, w1, w2, g1p, g2p, tr=512, chunks=2):
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    nb = tr // D
    w13 = w1.reshape(m, m, h1)
    w1sym = (w13 + jnp.swapaxes(w13, 0, 1)).reshape(m, m * h1)
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), h1, axis=0)

    def kern(g1p_ref, g2p_ref, x0_ref, x1_ref, w2_ref, w1s_ref, ones_ref,
             gx0_ref, gw1_ref, gw2_ref, wp_s, gw1_s, gw2_s):
        x0 = x0_ref[:]
        xk = x1_ref[:]
        step = pl.program_id(0)
        first = step == 0

        @pl.when(first)
        def _():
            wp_s[:] = jnp.concatenate(
                [w2_ref[:, i * h2 : (i + 1) * h2] for i in range(m)], axis=0
            )

        # expand pool grads to rows (each example's D rows share the grad)
        g2 = jnp.broadcast_to(
            g2p_ref[:].reshape(nb, 1, h2), (nb, D, h2)
        ).reshape(tr, h2)
        g1 = jnp.broadcast_to(
            g1p_ref[:].reshape(nb, 1, h1), (nb, D, h1)
        ).reshape(tr, h1)

        # ---- L2 backward (production formulation) ----
        cw = (m * h1) // chunks
        t1_parts = [
            jax.lax.dot_general(
                g2, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for c in range(chunks)
        ]
        t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]
        gx1 = None
        q_parts, z_parts = [], []
        for i in range(m):
            t1_i = t1[:, i * h1 : (i + 1) * h1]
            x0_i = x0[:, i : i + 1]
            contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
            gx1 = contrib if gx1 is None else gx1 + contrib
            q_parts.append(t1_i * xk)
            z_parts.append(xk * x0_i)
        gx1 = (gx1 + g1.astype(jnp.float32)).astype(jnp.bfloat16)  # + pool-1 grad
        q = jnp.concatenate(q_parts, axis=1)
        gx0_a = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32)
        z = jnp.concatenate(z_parts, axis=1)
        gw2_step = jax.lax.dot_general(z, g2, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        # ---- L1 backward (u-form; xk == x0 merged via w1sym) ----
        u = jnp.concatenate([gx1 * x0[:, i : i + 1] for i in range(m)], axis=1)
        gx0_b = jax.lax.dot_general(
            u, w1s_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gw1_step = jax.lax.dot_general(
            x0, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
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
            gw1_ref[:] = gw1_s[:]
            gw2_ref[:] = jnp.concatenate(
                [gw2_s[i * h1 : (i + 1) * h1, :] for i in range(m)], axis=1
            )

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((nb, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((m, m * h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, m * h2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m * h2, h2), jnp.bfloat16),
            pltpu.VMEM((m, m * h1), jnp.float32),
            pltpu.VMEM((m * h1, h2), jnp.float32),
        ],
        compiler_params=VMEM,
    )(g1p, g2p, x02, x1, w2, w1sym, ones_blk)


# ------------------------------------------------------------- references
def ref_fwd(x02, w1, w2):
    x1 = K._cin_layer_2d(x02, x02, w1)
    x2 = K._cin_layer_2d(x1, x02, w2)
    p1 = jnp.sum(x1.reshape(B, D, H1), axis=1)
    p2 = jnp.sum(x2.reshape(B, D, H2), axis=1)
    return x1, p1, p2


def ref_loss(x02, w1, w2, c1, c2):
    x1, p1, p2 = ref_fwd(x02, w1, w2)
    return jnp.sum(p1.astype(jnp.float32) * c1) + jnp.sum(p2.astype(jnp.float32) * c2)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((M, M * H1)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((H1, M * H2)) * 0.05, jnp.bfloat16)
    c1 = jnp.asarray(rng.standard_normal((B, H1)), jnp.float32)
    c2 = jnp.asarray(rng.standard_normal((B, H2)), jnp.float32)

    # correctness: forward
    x1r, p1r, p2r = jax.jit(ref_fwd)(x0, w1, w2)
    x1f, p1f, p2f = jax.jit(lambda *a: fused_fwd(*a))(x0, w1, w2)
    for name, a, b in [("x1", x1f, x1r), ("p1", p1f, p1r), ("p2", p2f, p2r)]:
        ra = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        rb = jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9
        print(f"fwd {name}: rel {float(ra/rb):.2e}")

    # correctness: backward vs autodiff of the reference
    gref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(x0, w1, w2, c1, c2)
    g1p = c1.astype(jnp.bfloat16)
    g2p = c2.astype(jnp.bfloat16)
    gx0, gw1, gw2 = jax.jit(lambda *a: fused_bwd(*a))(x0, x1f, w1, w2, g1p, g2p)
    for name, a, b in [("gx0", gx0, gref[0]), ("gw1", gw1, gref[1]), ("gw2", gw2, gref[2])]:
        ra = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        rb = jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9
        print(f"bwd {name}: rel {float(ra/rb):.2e}")

    # timing
    timeit("ref fwd (2 kernels + XLA pools)", ref_fwd, x0, w1, w2)
    for tr in [512, 1024]:
        try:
            timeit(f"fused fwd tr={tr}", lambda *a, tr=tr: fused_fwd(*a, tr), x0, w1, w2)
        except Exception as ex:
            print(f"fused fwd tr={tr} FAILED: {str(ex)[:120]}")
    timeit("ref bwd (L2 kernel + L1 einsum, incl g expand)",
           lambda x0_, w1_, w2_, c1_, c2_: jax.grad(ref_loss, argnums=(0, 1, 2))(
               x0_, w1_, w2_, c1_, c2_), x0, w1, w2, c1, c2)
    for tr in [512, 1024]:
        for ch in [1, 2]:
            try:
                timeit(f"fused bwd tr={tr} ch={ch}",
                       lambda *a, tr=tr, ch=ch: fused_bwd(*a, tr, ch),
                       x0, x1f, w1, w2, g1p, g2p)
            except Exception as ex:
                print(f"fused bwd tr={tr} ch={ch} FAILED: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
