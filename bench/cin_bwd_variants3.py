#!/usr/bin/env python
"""Round 3: all-MXU CIN backward — replace the 26-term f32 VPU fold for
gxk with a block-ones dot, so the kernel is 4 big MXU dots + cheap bf16
lane-expand products. Also: split two-kernel formulation."""

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
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))
from profile_cin import timeit

R, M, HN, HK = 262144, 26, 128, 128


def _bwd_mxu(g_ref, xk_ref, x0_ref, w2_ref, ones_ref, fold_ref,
             gxk_ref, gx0_ref, gw_ref, wp_s, gw_s, *, m, hn, chunks):
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

    cw = (m * hk) // chunks
    t1_parts = [
        jax.lax.dot_general(
            g, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for c in range(chunks)
    ]
    t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]

    q_parts = []
    z_parts = []
    p_parts = []
    for i in range(m):
        t1_i = t1[:, i * hk : (i + 1) * hk]
        x0_i = x0[:, i : i + 1]
        q_parts.append(t1_i * xk)
        z_parts.append(xk * x0_i)
        p_parts.append(t1_i * x0_i)
    q = jnp.concatenate(q_parts, axis=1)
    z = jnp.concatenate(z_parts, axis=1)
    p = jnp.concatenate(p_parts, axis=1)
    gxk_ref[:] = jnp.dot(
        p, fold_ref[:], preferred_element_type=jnp.float32
    ).astype(gxk_ref.dtype)
    gx0_ref[:] = jnp.dot(
        q, ones_ref[:], preferred_element_type=jnp.float32
    ).astype(gx0_ref.dtype)
    gw_step = jax.lax.dot_general(
        z, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

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


def bwd_mxu(xk2, x02, w2, g, tr, chunks):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)
    fold_blk = jnp.concatenate([jnp.eye(hk, dtype=jnp.bfloat16)] * m, axis=0)
    return pl.pallas_call(
        functools.partial(_bwd_mxu, m=m, hn=hn, chunks=chunks),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(g, xk2, x02, w2, ones_blk, fold_blk)


# --------------------------------------------- split: gw in its own kernel
def _bwd_gw_only(g_ref, xk_ref, x0_ref, gw_ref, gw_s, *, m, hn):
    g = g_ref[:]
    xk = xk_ref[:]
    x0 = x0_ref[:]
    hk = xk.shape[1]
    step = pl.program_id(0)
    first = step == 0
    z = jnp.concatenate([xk * x0[:, i : i + 1] for i in range(m)], axis=1)
    gw_step = jax.lax.dot_general(
        z, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

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


def _bwd_gx_only(g_ref, xk_ref, x0_ref, w2_ref, ones_ref, fold_ref,
                 gxk_ref, gx0_ref, wp_s, *, m, hn, chunks):
    g = g_ref[:]
    xk = xk_ref[:]
    x0 = x0_ref[:]
    hk = xk.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        wp_s[:] = jnp.concatenate(
            [w2_ref[:, i * hn : (i + 1) * hn] for i in range(m)], axis=0
        )

    cw = (m * hk) // chunks
    t1_parts = [
        jax.lax.dot_general(
            g, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for c in range(chunks)
    ]
    t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]
    q_parts = []
    p_parts = []
    for i in range(m):
        t1_i = t1[:, i * hk : (i + 1) * hk]
        q_parts.append(t1_i * xk)
        p_parts.append(t1_i * x0[:, i : i + 1])
    q = jnp.concatenate(q_parts, axis=1)
    p = jnp.concatenate(p_parts, axis=1)
    gxk_ref[:] = jnp.dot(p, fold_ref[:], preferred_element_type=jnp.float32).astype(gxk_ref.dtype)
    gx0_ref[:] = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32).astype(gx0_ref.dtype)


def bwd_split(xk2, x02, w2, g, tr_gw, tr_gx, chunks):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)
    fold_blk = jnp.concatenate([jnp.eye(hk, dtype=jnp.bfloat16)] * m, axis=0)
    gw = pl.pallas_call(
        functools.partial(_bwd_gw_only, m=m, hn=hn),
        grid=(rows // tr_gw,),
        in_specs=[
            pl.BlockSpec((tr_gw, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr_gw, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr_gw, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hk, m * hn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m * hk, hn), jnp.float32)],
    )(g, xk2, x02)
    gxk, gx0 = pl.pallas_call(
        functools.partial(_bwd_gx_only, m=m, hn=hn, chunks=chunks),
        grid=(rows // tr_gx,),
        in_specs=[
            pl.BlockSpec((tr_gx, hn), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr_gx, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr_gx, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, m * hn), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hk, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * hk, hk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr_gx, hk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr_gx, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, hk), xk2.dtype),
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((m * hk, hn), jnp.bfloat16)],
    )(g, xk2, x02, w2, ones_blk, fold_blk)
    return gxk, gx0, gw


def main():
    rng = np.random.default_rng(0)
    xk = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)), jnp.float32).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)

    ref_out = jax.jit(K._cin_bwd_pallas)(xk, x0, w2, g)
    for name, fn in [("mxu tr=512 ch=2", lambda *a: bwd_mxu(*a, 512, 2)),
                     ("split 512/512", lambda *a: bwd_split(*a, 512, 512, 2))]:
        try:
            out = jax.jit(fn)(xk, x0, w2, g)
            errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                    for a, b in zip(out, ref_out)]
            print(f"{name}: max abs err vs current kernel {errs}")
        except Exception as ex:
            print(f"{name} FAILED: {str(ex)[:140]}")

    for tr, ch in [(256, 1), (512, 2)]:
        try:
            timeit(f"bwd mxu tr={tr} ch={ch}",
                   lambda a, b, c, d, tr=tr, ch=ch: bwd_mxu(a, b, c, d, tr, ch),
                   xk, x0, w2, g)
        except Exception as ex:
            print(f"mxu tr={tr} FAILED: {str(ex)[:140]}")
    for tg, tx, ch in [(512, 512, 2), (1024, 512, 2), (1024, 1024, 4)]:
        try:
            timeit(f"bwd split gw={tg} gx={tx} ch={ch}",
                   lambda a, b, c, d, tg=tg, tx=tx, ch=ch:
                   bwd_split(a, b, c, d, tg, tx, ch), xk, x0, w2, g)
        except Exception as ex:
            print(f"split {tg}/{tx} FAILED: {str(ex)[:140]}")


if __name__ == "__main__":
    main()
