#!/usr/bin/env python
"""Race Pallas CIN-backward candidates for LAYER 1 (hk = m = 26, hn = 128,
R = B*D = 262144) against the production einsum fallback.

Layer 1 is the only CIN layer still on the einsum path after the round-3
tr=512 rework made the Pallas backward the default for aligned (hk%128==0)
layers: its hk=26 makes lane slices of a [tr, m*hk] projection misaligned.
The candidates below avoid the misalignment entirely by contracting per-i
against 128-ALIGNED lane slices of the flat weight w2[:, i*hn:(i+1)*hn]
(no wp permute scratch at all), emitting gw directly in the flat layout.

The einsum fallback at this shape materializes t[h,i,r] = sum_n w3*g as a
[26, 26, 262144] = 354MB bf16 HBM intermediate (xplane r3: 0.71+0.58+0.58ms
sync fusions + the feeding DMA queues).
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))
from profile_cin import timeit

R, M, HN = 262144, 26, 128
HK = M  # layer 1: xk IS the field matrix


def einsum_bwd(xk2, x02, w2, g):
    hk = xk2.shape[1]
    m = x02.shape[1]
    hn = w2.shape[1] // m
    w3 = w2.reshape(hk, m, hn)
    gxk = jnp.einsum("rn,hin,ri->rh", g, w3, x02)
    gx0 = jnp.einsum("rn,hin,rh->ri", g, w3, xk2)
    gw3 = jnp.einsum("rn,rh,ri->hin", g, xk2, x02)
    return gxk, gx0, gw3.reshape(hk, m * hn)


# ------------------------------------------------ candidate A: per-i dots
def _bwd_smallhk(g_ref, xk_ref, x0_ref, w2_ref, gxk_ref, gx0_ref, gw_ref,
                 gw_s, *, m, hn):
    g = g_ref[:]    # [tr, hn] bf16
    xk = xk_ref[:]  # [tr, hk] bf16
    x0 = x0_ref[:]  # [tr, m]  bf16
    step = pl.program_id(0)
    first = step == 0
    gxk = None
    gx0_cols = []
    gw_blocks = []
    xk_f = xk.astype(jnp.float32)
    for i in range(m):
        w2_i = w2_ref[:, i * hn : (i + 1) * hn]  # [hk, hn] aligned lane slice
        t1_i = jax.lax.dot_general(
            g, w2_i, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tr, hk] f32
        x0_i = x0[:, i : i + 1]
        contrib = t1_i * x0_i.astype(jnp.float32)
        gxk = contrib if gxk is None else gxk + contrib
        gx0_cols.append(jnp.sum(t1_i * xk_f, axis=1, keepdims=True))
        z_i = xk * x0_i  # [tr, hk] bf16
        gw_blocks.append(jax.lax.dot_general(
            z_i, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # [hk, hn]
    gxk_ref[:] = gxk.astype(gxk_ref.dtype)
    gx0_ref[:] = jnp.concatenate(gx0_cols, axis=1).astype(gx0_ref.dtype)
    gw_step = jnp.concatenate(gw_blocks, axis=1)  # [hk, m*hn]: flat layout

    @pl.when(first)
    def _():
        gw_s[:] = gw_step

    @pl.when(jnp.logical_not(first))
    def _():
        gw_s[:] += gw_step

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        gw_ref[:] = gw_s[:]


def bwd_smallhk(xk2, x02, w2, g, tr):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    return pl.pallas_call(
        functools.partial(_bwd_smallhk, m=m, hn=hn),
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
        scratch_shapes=[pltpu.VMEM((hk, m * hn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(g, xk2, x02, w2)


# --------------------------------------- candidate B: one padded-t1 dot
# wp[(i*128 + h), n] = w2[h, i*hn + n], rows padded hk->128 per i block so
# every t1 lane slice is 128-aligned; the pad is built OUTSIDE (XLA pad of
# a 173KB weight) and passed in.
def _bwd_padt1(g_ref, xk_ref, x0_ref, wp_ref, gxk_ref, gx0_ref, gw_ref,
               gw_s, *, m, hn, hk):
    g = g_ref[:]
    xk = xk_ref[:]
    x0 = x0_ref[:]
    step = pl.program_id(0)
    first = step == 0
    t1 = jax.lax.dot_general(
        g, wp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tr, m*128] f32
    gxk = None
    gx0_cols = []
    gw_blocks = []
    xk_f = xk.astype(jnp.float32)
    for i in range(m):
        t1_i = t1[:, i * 128 : i * 128 + hk]  # aligned start, short len
        x0_i = x0[:, i : i + 1]
        contrib = t1_i * x0_i.astype(jnp.float32)
        gxk = contrib if gxk is None else gxk + contrib
        gx0_cols.append(jnp.sum(t1_i * xk_f, axis=1, keepdims=True))
        z_i = xk * x0_i
        gw_blocks.append(jax.lax.dot_general(
            z_i, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    gxk_ref[:] = gxk.astype(gxk_ref.dtype)
    gx0_ref[:] = jnp.concatenate(gx0_cols, axis=1).astype(gx0_ref.dtype)
    gw_step = jnp.concatenate(gw_blocks, axis=1)

    @pl.when(first)
    def _():
        gw_s[:] = gw_step

    @pl.when(jnp.logical_not(first))
    def _():
        gw_s[:] += gw_step

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        gw_ref[:] = gw_s[:]


def bwd_padt1(xk2, x02, w2, g, tr):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    # wp[(i*128+h), n] = w2[h, i*hn+n]
    w3 = w2.reshape(hk, m, hn)
    wp = jnp.zeros((m, 128, hn), w2.dtype).at[:, :hk, :].set(
        jnp.swapaxes(w3, 0, 1)
    ).reshape(m * 128, hn)
    return pl.pallas_call(
        functools.partial(_bwd_padt1, m=m, hn=hn, hk=hk),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * 128, hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        # ADVICE r3 #1: this call passed w2 (shape [hk, m*hn]) while the
        # BlockSpec expected the padded/transposed wp [m*128, hn] — the
        # kernel read a zero-padded wrong block, so candidate B's timing
        # was of the wrong computation. Fixed to pass wp; numbers re-run.
    )(g, xk2, x02, wp)


def main():
    rng = np.random.default_rng(0)
    xk2 = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x02 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)) * 0.05, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)

    ref = [np.asarray(x, np.float32) for x in jax.jit(einsum_bwd)(xk2, x02, w2, g)]

    def check(name, outs):
        for r, o, lbl in zip(ref, outs, ("gxk", "gx0", "gw")):
            o = np.asarray(o, np.float32)
            denom = np.maximum(np.abs(r), 1.0)
            err = np.max(np.abs(r - o) / denom)
            print(f"  {name} {lbl}: max rel err {err:.3e}")

    check("smallhk tr=256", jax.jit(lambda *a: bwd_smallhk(*a, 256))(xk2, x02, w2, g))
    check("padt1   tr=256", jax.jit(lambda *a: bwd_padt1(*a, 256))(xk2, x02, w2, g))

    timeit("einsum fallback    ", einsum_bwd, xk2, x02, w2, g)
    for tr in (128, 256, 512):
        timeit(f"smallhk tr={tr:<5}", lambda *a: bwd_smallhk(*a, tr), xk2, x02, w2, g)
        timeit(f"padt1   tr={tr:<5}", lambda *a: bwd_padt1(*a, tr), xk2, x02, w2, g)


if __name__ == "__main__":
    main()
