#!/usr/bin/env python
"""Race alternative Pallas CIN-backward formulations at the flagship L2
shape (R=262144, hk=128, m=26, hn=128). Candidates vary tile size and how
q/z/gw are formed (lane-concats vs per-i dots vs VPU reductions)."""

from __future__ import annotations

import functools
import os
import sys
import time

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
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))
from profile_cin import timeit

R, M, HN, HK = 262144, 26, 128, 128


# ---------------------------------------------------------------- variant B
def _bwd_loopdots(g_ref, xk_ref, x0_ref, w2_ref, gxk_ref, gx0_ref, gw_ref,
                  wp_s, gw_s, *, m, hn):
    g = g_ref[:]
    xk = xk_ref[:]
    x0 = x0_ref[:]
    hk = xk.shape[1]
    step = pl.program_id(0)
    first = step == 0

    @pl.when(first)
    def _():
        wp_s[:] = jnp.concatenate(
            [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
        )

    t1 = jax.lax.dot_general(
        g, wp_s[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [tr, m*hk]

    gxk = None
    gx0_cols = []
    gw_new = []
    for i in range(m):
        t1_i = t1[:, i * hk : (i + 1) * hk]
        x0_i = x0[:, i : i + 1]
        contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
        gxk = contrib if gxk is None else gxk + contrib
        gx0_cols.append(jnp.sum(t1_i.astype(jnp.float32) * xk.astype(jnp.float32),
                                axis=1, keepdims=True))
        z_i = xk * x0_i  # [tr, hk] bf16
        gw_new.append(jax.lax.dot_general(
            z_i, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # [hk, hn]
    gxk_ref[:] = gxk.astype(gxk_ref.dtype)
    gx0_ref[:] = jnp.concatenate(gx0_cols, axis=1).astype(gx0_ref.dtype)
    gw_step = jnp.concatenate(gw_new, axis=1)  # [hk, m*hn] flat layout

    @pl.when(first)
    def _():
        gw_s[:] = gw_step

    @pl.when(jnp.logical_not(first))
    def _():
        gw_s[:] += gw_step

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        gw_ref[:] = gw_s[:]


def bwd_loopdots(xk2, x02, w2, g, tr):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    return pl.pallas_call(
        functools.partial(_bwd_loopdots, m=m, hn=hn),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((hk, m * hn), jnp.float32),
        ],
    )(g, xk2, x02, w2)


# ---------------------------------------------------------------- variant C
# like the production kernel (q/z lane-concats + ones-dot for gx0 + one big
# gw dot) but z built by tiling xk once and scaling with an expanded x0
# formed by a 0/1 MXU dot (x0e = x0 @ E, E[i, i*hk+h] = 1).
def _bwd_x0e(g_ref, xk_ref, x0_ref, w2_ref, e_ref, ones_ref,
             gxk_ref, gx0_ref, gw_ref, wp_s, gw_s, *, m, hn):
    g = g_ref[:]
    xk = xk_ref[:]
    x0 = x0_ref[:]
    hk = xk.shape[1]
    step = pl.program_id(0)
    first = step == 0

    @pl.when(first)
    def _():
        wp_s[:] = jnp.concatenate(
            [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
        )

    t1 = jax.lax.dot_general(
        g, wp_s[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [tr, m*hk]
    x0e = jnp.dot(x0, e_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )  # [tr, m*hk]: col (i*hk+h) = x0[:, i]
    xkt = jnp.concatenate([xk] * m, axis=1)  # [tr, m*hk]
    gxk_f = t1.astype(jnp.float32) * x0e.astype(jnp.float32)
    # fold m: gxk[r,h] = sum_i gxk_f[:, i*hk+h] — via ones-dot on bf16
    q = t1 * xkt
    z = xkt * x0e
    gx0_ref[:] = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32).astype(
        gx0_ref.dtype
    )
    # gxk fold via m-unrolled adds (f32)
    acc = gxk_f[:, 0:hk]
    for i in range(1, m):
        acc = acc + gxk_f[:, i * hk : (i + 1) * hk]
    gxk_ref[:] = acc.astype(gxk_ref.dtype)
    gw_step = jax.lax.dot_general(
        z, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [m*hk, hn]

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


def bwd_x0e(xk2, x02, w2, g, tr):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    e = np.zeros((m, m * hk), np.float32)
    for i in range(m):
        e[i, i * hk : (i + 1) * hk] = 1.0
    e = jnp.asarray(e, jnp.bfloat16)
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)
    return pl.pallas_call(
        functools.partial(_bwd_x0e, m=m, hn=hn),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m * hk), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((hk, m * hn), jnp.float32),
        ],
    )(g, xk2, x02, w2, e, ones_blk)


def main():
    rng = np.random.default_rng(0)
    xk = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)), jnp.float32).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)

    # correctness vs einsum reference first
    ref_out = K._cin_2d_bwd((xk, x0, w2), g)
    for name, fn in [("loopdots tr=256", lambda *a: bwd_loopdots(*a, 256)),
                     ("x0e tr=256", lambda *a: bwd_x0e(*a, 256))]:
        try:
            out = jax.jit(fn)(xk, x0, w2, g)
            errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                    for a, b in zip(out, ref_out)]
            print(f"{name}: max abs err vs einsum {errs}")
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")

    timeit("bwd pallas current tr=256", K._cin_bwd_pallas, xk, x0, w2, g)
    for tr in (128, 256, 512):
        try:
            timeit(f"bwd loopdots tr={tr}",
                   lambda xk, x0, w2, g, tr=tr: bwd_loopdots(xk, x0, w2, g, tr),
                   xk, x0, w2, g)
        except Exception as ex:
            print(f"loopdots tr={tr} FAILED: {str(ex)[:150]}")
    for tr in (128, 256, 512):
        try:
            timeit(f"bwd x0e tr={tr}",
                   lambda xk, x0, w2, g, tr=tr: bwd_x0e(xk, x0, w2, g, tr),
                   xk, x0, w2, g)
        except Exception as ex:
            print(f"x0e tr={tr} FAILED: {str(ex)[:150]}")


if __name__ == "__main__":
    main()
