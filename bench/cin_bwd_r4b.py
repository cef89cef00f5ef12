#!/usr/bin/env python
"""Round-4 CIN backward, e-form: the micro race (cin_bwd_micro.py) showed
the kernel's bottleneck is NOT the MXU dots (a 436M-FLOP dot adds 0.04ms
over the pipeline floor - fully overlapped) but the 26 per-row-scalar
lane-BROADCAST muls (xk * x0[:, i:i+1], ~1.3ms isolated). The e-form
replaces every broadcast with one one-hot MXU expansion dot
e = x0 @ E, E[i, i*hk+h] = 1  ->  e[r, (i,h)] = x0[r, i]
after which all pair products are full-width VMEM muls with zero
broadcasts, and the gxk fold becomes 26 lane-SLICE adds (cheap) instead
of broadcast fmas."""

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


def expand_mat(m, blk):
    """E[i, i*blk + j] = 1 (bf16 [m, m*blk])."""
    return jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), blk, axis=0).T.copy()


def bwd_eform(xk2, x02, w2, g, tr, chunks=2, fold_dot=False):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    e_mat = expand_mat(m, hk)                       # [m, m*hk]
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)  # [m*hk, m]
    fold = jnp.concatenate([jnp.eye(hk, dtype=jnp.bfloat16)] * m, axis=0)  # [m*hk, hk]

    def kern(g_ref, xk_ref, x0_ref, w2_ref, e_ref, ones_ref, fold_ref,
             gxk_ref, gx0_ref, gw_ref, wp_s, gw_s):
        g_ = g_ref[:]
        xk = xk_ref[:]
        step = pl.program_id(0)
        first = step == 0

        @pl.when(first)
        def _():
            wp_s[:] = jnp.concatenate(
                [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
            )

        # lane-expanded x0: e[r, (i,h)] = x0[r, i]  (one MXU dot, no broadcasts)
        e = jnp.dot(x0_ref[:], e_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        xt = jnp.concatenate([xk] * m, axis=1)      # [tr, m*hk] lane tile-copy

        cw = (m * hk) // chunks
        t1_parts = [
            jax.lax.dot_general(
                g_, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for c in range(chunks)
        ]
        t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]

        z = xt * e                                   # wide mul, no broadcast
        q = t1 * xt
        p = t1 * e
        if fold_dot:
            gxk_ref[:] = jnp.dot(p, fold_ref[:], preferred_element_type=jnp.float32
                                 ).astype(gxk_ref.dtype)
        else:
            acc = p[:, 0:hk].astype(jnp.float32)
            for i in range(1, m):
                acc = acc + p[:, i * hk : (i + 1) * hk].astype(jnp.float32)
            gxk_ref[:] = acc.astype(gxk_ref.dtype)
        gx0_ref[:] = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32
                             ).astype(gx0_ref.dtype)
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
            pl.BlockSpec((m, m * hk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hk, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hk, hk), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        compiler_params=VMEM,
    )(g, xk2, x02, w2, e_mat, ones_blk, fold)


# ----------------------------------------------------------- e-form (L1)
def bwd_l1_eform(x02, w2, g, tr):
    rows, m = x02.shape
    hn = w2.shape[1] // m
    w3 = w2.reshape(m, m, hn)
    wsym = (w3 + jnp.swapaxes(w3, 0, 1)).reshape(m, m * hn)
    e_mat = expand_mat(m, hn)  # [m, m*hn]

    def kern(g_ref, x0_ref, wsym_ref, e_ref, gx0_ref, gw_ref, gw_s):
        g_ = g_ref[:]
        x0 = x0_ref[:]
        step = pl.program_id(0)
        first = step == 0
        e = jnp.dot(x0, e_ref[:], preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        gt = jnp.concatenate([g_] * m, axis=1)
        u = gt * e
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
    )(g, x02, wsym, e_mat)


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

    check("eform tr=512", jax.jit(lambda *a: bwd_eform(*a, 512))(xk, x0, w2, g), ref)
    l1_ref = jax.jit(l1_einsum)(x0, w2_l1, g)
    check("l1 eform tr=512", jax.jit(lambda *a: bwd_l1_eform(*a, 512))(x0, w2_l1, g), l1_ref)

    timeit("cur prod (tr=512 ch=2)", K._cin_bwd_pallas, xk, x0, w2, g)
    for tr in [512, 1024]:
        for ch in [1, 2]:
            try:
                timeit(f"eform tr={tr} ch={ch} fold=slice",
                       lambda *a, tr=tr, ch=ch: bwd_eform(*a, tr, ch), xk, x0, w2, g)
            except Exception as ex:
                print(f"eform tr={tr} ch={ch} FAILED: {str(ex)[:120]}")
    try:
        timeit("eform tr=512 ch=2 fold=dot",
               lambda *a: bwd_eform(*a, 512, 2, fold_dot=True), xk, x0, w2, g)
    except Exception as ex:
        print(f"eform fold=dot FAILED: {str(ex)[:120]}")

    print("--- L1 ---")
    timeit("l1 einsum", l1_einsum, x0, w2_l1, g)
    for tr in [512, 1024, 2048]:
        try:
            timeit(f"l1 eform tr={tr}", lambda *a, tr=tr: bwd_l1_eform(*a, tr), x0, w2_l1, g)
        except Exception as ex:
            print(f"l1 eform tr={tr} FAILED: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
