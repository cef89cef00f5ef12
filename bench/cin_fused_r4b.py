#!/usr/bin/env python
"""Round-4 fused CIN v2: pair-first L1.

L1 insight: m = 26 < H1 = 128, so building the pair-product tensor FIRST
    P[r, (h,i)] = x0[r,h] * x0[r,i]          (676 lanes, pad to 768)
and contracting x1 = P @ W1p (W1p[(h,i), n] = w3[h,i,n]) does 5x less
elementwise work than the projection-then-fold order (fold width m*H =
3328). All expansions ride one-hot MXU dots (e1 = x0@EA, e2 = x0@EB), so
there are NO per-column broadcasts and NO misaligned lane slices.

L1 backward is then:
    gP  = gx1 @ W1p^T                        (NT dot)
    gx0 = (gP.e2) @ OA + (gP.e1) @ OB        (2 wide muls + 2 ones-dots)
    gW1p = P^T @ gx1                         (row-contraction dot)
vs the einsum path's 354MB [26,26,262144] HBM intermediate.

L2 keeps the production formulation (H1 = 128 = H2: pair-first is neutral
there). Everything fused: one forward kernel (x0 -> x1, pool1, pool2),
one backward kernel (pool grads -> gx0, gW1p, gw2)."""

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
MP = -(-M * M // 128) * 128  # 676 -> 768 padded pair lanes
VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def onehots(m, dtype=jnp.bfloat16):
    """EA[h, (h,i)] = 1; EB[i, (h,i)] = 1; OA[(h,i), j] = 1[h==j];
    OB[(h,i), j] = 1[i==j]; pairs h-major, padded to MP lanes."""
    ea = np.zeros((m, MP), np.float32)
    eb = np.zeros((m, MP), np.float32)
    for h in range(m):
        for i in range(m):
            ea[h, h * m + i] = 1.0
            eb[i, h * m + i] = 1.0
    return (jnp.asarray(ea, dtype), jnp.asarray(eb, dtype),
            jnp.asarray(ea.T, dtype), jnp.asarray(eb.T, dtype))


def w1_to_pairs(w1_flat):
    """flat [m, m*h1] (w2[h, i*h1+n] = w3[h,i,n]... wait production layout is
    [H_prev=m, m*H1] with w2[h, i*hn+n] = w3from flatten: flatten_cin_w gives
    w[h_prev, i*hn + n]. For L1 h_prev=h. -> W1p[(h,i), n]."""
    m = w1_flat.shape[0]
    hn = w1_flat.shape[1] // m
    w3 = w1_flat.reshape(m, m, hn)  # [h, i, n]
    wp = w3.reshape(m * m, hn)
    return jnp.concatenate(
        [wp, jnp.zeros((MP - m * m, hn), wp.dtype)], axis=0
    )


def fused_fwd2(x02, w1p, w2, ea, eb, tr=512):
    rows, m = x02.shape
    h1 = w1p.shape[1]
    h2 = w2.shape[1] // m
    nb = tr // D

    def kern(x0_ref, w1p_ref, w2_ref, ea_ref, eb_ref, x1_ref, p1_ref, p2_ref):
        x0 = x0_ref[:]
        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        pp = e1 * e2
        x1 = jnp.dot(pp, w1p_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x1_ref[:] = x1
        t2 = jnp.dot(x1, w2_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        acc = t2[:, 0:h2] * x0[:, 0:1]
        for i in range(1, m):
            acc = acc + t2[:, i * h2 : (i + 1) * h2] * x0[:, i : i + 1]
        x2 = acc
        p1_ref[:] = jnp.sum(x1.reshape(nb, D, h1).astype(jnp.float32), axis=1
                            ).astype(p1_ref.dtype)
        p2_ref[:] = jnp.sum(x2.reshape(nb, D, h2).astype(jnp.float32), axis=1
                            ).astype(p2_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, MP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, MP), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(x02, w1p, w2, ea, eb)


def fused_bwd2(x02, x1, w1p, w2, g1p, g2p, ea, eb, oa, ob, tr=512, chunks=2):
    rows, m = x02.shape
    h1 = w1p.shape[1]
    h2 = w2.shape[1] // m
    nb = tr // D
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), h1, axis=0)

    def kern(g1p_ref, g2p_ref, x0_ref, x1_ref, w2_ref, w1p_ref, ea_ref,
             eb_ref, oa_ref, ob_ref, ones_ref,
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

        g2 = jnp.broadcast_to(g2p_ref[:].reshape(nb, 1, h2), (nb, D, h2)
                              ).reshape(tr, h2)
        g1 = jnp.broadcast_to(g1p_ref[:].reshape(nb, 1, h1), (nb, D, h1)
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
        gx1 = (gx1 + g1.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate(q_parts, axis=1)
        gx0_a = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32)
        z = jnp.concatenate(z_parts, axis=1)
        gw2_step = jax.lax.dot_general(z, g2, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        # ---- L1 backward (pair-first) ----
        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        gp = jax.lax.dot_general(
            gx1, w1p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [tr, MP]
        gx0_b = (
            jnp.dot(gp * e2, oa_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(gp * e1, ob_ref[:], preferred_element_type=jnp.float32)
        )
        gw1_step = jax.lax.dot_general(
            e1 * e2, gx1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [MP, h1]
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
            pl.BlockSpec((MP, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, MP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, MP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MP, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((MP, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, m * h2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m * h2, h2), jnp.bfloat16),
            pltpu.VMEM((MP, h1), jnp.float32),
            pltpu.VMEM((m * h1, h2), jnp.float32),
        ],
        compiler_params=VMEM,
    )(g1p, g2p, x02, x1, w2, w1p, ea, eb, oa, ob, ones_blk)


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
    ea, eb, oa, ob = onehots(M)
    w1p = w1_to_pairs(w1)

    x1r, p1r, p2r = jax.jit(ref_fwd)(x0, w1, w2)
    x1f, p1f, p2f = jax.jit(lambda a, b, c: fused_fwd2(a, b, c, ea, eb))(x0, w1p, w2)
    for name, a, b in [("x1", x1f, x1r), ("p1", p1f, p1r), ("p2", p2f, p2r)]:
        ra = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        rb = jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9
        print(f"fwd {name}: rel {float(ra/rb):.2e}")

    gref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(x0, w1, w2, c1, c2)
    g1p = c1.astype(jnp.bfloat16)
    g2p = c2.astype(jnp.bfloat16)
    gx0, gw1p, gw2 = jax.jit(
        lambda *a: fused_bwd2(*a, ea, eb, oa, ob)
    )(x0, x1f, w1p, w2, g1p, g2p)
    gw1_ref_p = w1_to_pairs(gref[1])
    for name, a, b in [("gx0", gx0, gref[0]), ("gw1", gw1p, gw1_ref_p), ("gw2", gw2, gref[2])]:
        ra = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        rb = jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-9
        print(f"bwd {name}: rel {float(ra/rb):.2e}")

    timeit("ref fwd (2 kernels + XLA pools)", ref_fwd, x0, w1, w2)
    for tr in [512, 1024]:
        try:
            timeit(f"fused2 fwd tr={tr}",
                   lambda a, b, c, tr=tr: fused_fwd2(a, b, c, ea, eb, tr), x0, w1p, w2)
        except Exception as ex:
            print(f"fused2 fwd tr={tr} FAILED: {str(ex)[:120]}")
    timeit("ref bwd (autodiff whole CIN)",
           lambda x0_, w1_, w2_, c1_, c2_: jax.grad(ref_loss, argnums=(0, 1, 2))(
               x0_, w1_, w2_, c1_, c2_), x0, w1, w2, c1, c2)
    for tr in [512, 1024]:
        for ch in [2]:
            try:
                timeit(f"fused2 bwd tr={tr} ch={ch}",
                       lambda *a, tr=tr, ch=ch: fused_bwd2(*a, ea, eb, oa, ob, tr, ch),
                       x0, x1f, w1p, w2, g1p, g2p)
            except Exception as ex:
                print(f"fused2 bwd tr={tr} ch={ch} FAILED: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
