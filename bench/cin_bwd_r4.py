#!/usr/bin/env python
"""Round 4 CIN backward races.

L2 (hk=128): the production kernel measures 3.96ms in-step. Candidates:
  * current formulation with vmem_limit_bytes raised -> bigger tiles
    (tr=1024/2048) and/or unchunked t1 (the round-3 chunking existed only
    to duck the default Mosaic VMEM budget);
  * "u-form": u[r,(i,n)] = x0[r,i]*g[r,n] shared by gxk = u @ w2^T and
    gw = xk^T @ u (both consume the FLAT weight layout directly - no wp
    permute scratch, no final gw un-permute, no f32 VPU fold), plus the
    forward-projection recompute t = xk @ w2 for gx0. 3 big dots + 52
    bf16 lane-expand muls.

L1 (hk=m=26): einsum measured 0.93ms isolated / ~1.9ms of in-step fusions
(354MB HBM intermediate). Round-3 Pallas candidates lost 8-20x because
every dot had a 26-lane output. The u-form keeps every dot 3328 lanes wide:
  gw  = x0^T @ u                          [26, 3328]
  gx0 = u @ wsym^T, wsym[j,(i,n)] = w3[j,i,n] + w3[i,j,n]   [tr, 26]
(for L1 xk == x0 so the gxk and gx0 cotangents merge through wsym).
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

R, M, HN, HK = 262144, 26, 128, 128
VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


# ------------------------------------------------ current form, tunable
def bwd_cur(xk2, x02, w2, g, tr, chunks, vmem=True):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)

    def kern(g_ref, xk_ref, x0_ref, w2_ref, ones_ref, gxk_ref, gx0_ref,
             gw_ref, wp_s, gw_s):
        g_ = g_ref[:]
        xk = xk_ref[:]
        x0 = x0_ref[:]
        step = pl.program_id(0)
        first = step == 0

        @pl.when(first)
        def _():
            wp_s[:] = jnp.concatenate(
                [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
            )

        cw = (m * hk) // chunks
        t1_parts = [
            jax.lax.dot_general(
                g_, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for c in range(chunks)
        ]
        t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]
        gxk = None
        q_parts, z_parts = [], []
        for i in range(m):
            t1_i = t1[:, i * hk : (i + 1) * hk]
            x0_i = x0[:, i : i + 1]
            contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
            gxk = contrib if gxk is None else gxk + contrib
            q_parts.append(t1_i * xk)
            z_parts.append(xk * x0_i)
        gxk_ref[:] = gxk.astype(gxk_ref.dtype)
        q = jnp.concatenate(q_parts, axis=1)
        gx0_ref[:] = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32
                             ).astype(gx0_ref.dtype)
        z = jnp.concatenate(z_parts, axis=1)
        gw_step = jax.lax.dot_general(z, g_, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

        @pl.when(first)
        def _():
            gw_s[:] = gw_step

        @pl.when(jnp.logical_not(first))
        def _():
            gw_s[:] += gw_step

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw_ref[:] = jnp.concatenate(
                [gw_s[i * hk : (i + 1) * hk, :] for i in range(m)], axis=1
            )

    return pl.pallas_call(
        kern,
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
            pltpu.VMEM((m * hk, hn), jnp.bfloat16),
            pltpu.VMEM((m * hk, hn), jnp.float32),
        ],
        compiler_params=VMEM if vmem else None,
    )(g, xk2, x02, w2, ones_blk)


# ----------------------------------------------------------- u-form (L2)
def bwd_uform(xk2, x02, w2, g, tr):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    # ones_hn[(i,n), j] = 1[i == j]
    ones_hn = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hn, axis=0)

    def kern(g_ref, xk_ref, x0_ref, w2_ref, ones_ref, gxk_ref, gx0_ref,
             gw_ref, gw_s):
        g_ = g_ref[:]
        xk = xk_ref[:]
        x0 = x0_ref[:]
        step = pl.program_id(0)
        first = step == 0
        u = jnp.concatenate([g_ * x0[:, i : i + 1] for i in range(m)], axis=1)
        # gxk = u @ w2^T  (NT dot, flat weight layout directly)
        gxk_ref[:] = jax.lax.dot_general(
            u, w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gxk_ref.dtype)
        # gw += xk^T @ u  (row contraction, flat layout directly)
        gw_step = jax.lax.dot_general(
            xk, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(first)
        def _():
            gw_s[:] = gw_step

        @pl.when(jnp.logical_not(first))
        def _():
            gw_s[:] += gw_step

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw_ref[:] = gw_s[:]

        # gx0 via forward-projection recompute
        t = jnp.dot(xk, w2_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        v = jnp.concatenate(
            [t[:, i * hn : (i + 1) * hn] * g_ for i in range(m)], axis=1
        )
        gx0_ref[:] = jnp.dot(v, ones_ref[:], preferred_element_type=jnp.float32
                             ).astype(gx0_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hn, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((hk, m * hn), jnp.float32)],
        compiler_params=VMEM,
    )(g, xk2, x02, w2, ones_hn)


# ----------------------------------------------------------- u-form (L1)
def bwd_l1_uform(x02, w2, g, tr):
    """L1: xk == x0, hk == m. Returns (gx0_total, gw)."""
    rows, m = x02.shape
    hn = w2.shape[1] // m

    # wsym[j, (i,n)] = w3[j,i,n] + w3[i,j,n]
    w3 = w2.reshape(m, m, hn)
    wsym = (w3 + jnp.swapaxes(w3, 0, 1)).reshape(m, m * hn)

    def kern(g_ref, x0_ref, wsym_ref, gx0_ref, gw_ref, gw_s):
        g_ = g_ref[:]
        x0 = x0_ref[:]
        step = pl.program_id(0)
        first = step == 0
        u = jnp.concatenate([g_ * x0[:, i : i + 1] for i in range(m)], axis=1)
        gx0_ref[:] = jax.lax.dot_general(
            u, wsym_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(gx0_ref.dtype)
        gw_step = jax.lax.dot_general(
            x0, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(first)
        def _():
            gw_s[:] = gw_step

        @pl.when(jnp.logical_not(first))
        def _():
            gw_s[:] += gw_step

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw_ref[:] = gw_s[:]

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((m, m * hn), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((m, m * hn), jnp.float32)],
        compiler_params=VMEM,
    )(g, x02, wsym)


def l1_einsum(x02, w2, g):
    m = x02.shape[1]
    hn = w2.shape[1] // m
    w3 = w2.reshape(m, m, hn)
    gxk = jnp.einsum("rn,hin,ri->rh", g, w3, x02)
    gx0 = jnp.einsum("rn,hin,rh->ri", g, w3, x02)
    gw3 = jnp.einsum("rn,rh,ri->hin", g, x02, x02)
    return gxk + gx0, gw3.reshape(m, m * hn)


def main():
    rng = np.random.default_rng(0)
    xk = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)
    w2_l1 = jnp.asarray(rng.standard_normal((M, M * HN)) * 0.05, jnp.bfloat16)

    ref = jax.jit(K._cin_bwd_pallas)(xk, x0, w2, g)

    def check(name, out, ref_out):
        errs = []
        for a, b in zip(out, ref_out):
            a = a.astype(jnp.float32); b = b.astype(jnp.float32)
            errs.append(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9)))
        print(f"{name}: rel err {['%.1e' % e for e in errs]}")

    check("uform tr=512", jax.jit(lambda *a: bwd_uform(*a, 512))(xk, x0, w2, g), ref)
    l1_ref = jax.jit(l1_einsum)(x0, w2_l1, g)
    check("l1 uform tr=512", jax.jit(lambda *a: bwd_l1_uform(*a, 512))(x0, w2_l1, g), l1_ref)

    timeit("cur tr=512 ch=2 (prod)", lambda *a: bwd_cur(*a, 512, 2, vmem=False), xk, x0, w2, g)
    for tr, ch in [(512, 1), (1024, 1), (1024, 2), (2048, 2), (2048, 4)]:
        try:
            timeit(f"cur+vmem tr={tr} ch={ch}", lambda *a, tr=tr, ch=ch: bwd_cur(*a, tr, ch), xk, x0, w2, g)
        except Exception as ex:
            print(f"cur tr={tr} ch={ch} FAILED: {str(ex)[:120]}")
    for tr in [512, 1024, 2048]:
        try:
            timeit(f"uform tr={tr}", lambda *a, tr=tr: bwd_uform(*a, tr), xk, x0, w2, g)
        except Exception as ex:
            print(f"uform tr={tr} FAILED: {str(ex)[:120]}")

    print("--- L1 ---")
    timeit("l1 einsum", l1_einsum, x0, w2_l1, g)
    for tr in [512, 1024, 2048]:
        try:
            timeit(f"l1 uform tr={tr}", lambda *a, tr=tr: bwd_l1_uform(*a, tr), x0, w2_l1, g)
        except Exception as ex:
            print(f"l1 uform tr={tr} FAILED: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
