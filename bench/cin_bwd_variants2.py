#!/usr/bin/env python
"""Round 2 of CIN-backward variants: surgical changes to the production
kernel (which is t1-dot + q/z concats + ones-dot + one gw dot)."""

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


def _bwd_v2(g_ref, xk_ref, x0_ref, w2_ref, ones_ref, gxk_ref, gx0_ref,
            gw_ref, wp_s, gw_s, *, m, hn, use_ones_dot, chunks):
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

    # t1 in lane-chunks to bound the f32 transient at tr=512
    cw = (m * hk) // chunks
    t1_parts = []
    for c in range(chunks):
        t1_parts.append(
            jax.lax.dot_general(
                g, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )
    t1 = t1_parts[0] if chunks == 1 else jnp.concatenate(t1_parts, axis=1)

    gxk = None
    q_parts = []
    z_parts = []
    gx0_cols = []
    for i in range(m):
        t1_i = t1[:, i * hk : (i + 1) * hk]
        x0_i = x0[:, i : i + 1]
        contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
        gxk = contrib if gxk is None else gxk + contrib
        if use_ones_dot:
            q_parts.append(t1_i * xk)
        else:
            gx0_cols.append(
                jnp.sum(t1_i.astype(jnp.float32) * xk.astype(jnp.float32),
                        axis=1, keepdims=True))
        z_parts.append(xk * x0_i)
    gxk_ref[:] = gxk.astype(gxk_ref.dtype)
    if use_ones_dot:
        q = jnp.concatenate(q_parts, axis=1)
        gx0_ref[:] = jnp.dot(
            q, ones_ref[:], preferred_element_type=jnp.float32
        ).astype(gx0_ref.dtype)
    else:
        gx0_ref[:] = jnp.concatenate(gx0_cols, axis=1).astype(gx0_ref.dtype)
    z = jnp.concatenate(z_parts, axis=1)
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


def bwd_v2(xk2, x02, w2, g, tr, use_ones_dot, chunks):
    rows, hk = xk2.shape
    m = x02.shape[1]
    hn = w2.shape[1] // m
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), hk, axis=0)
    return pl.pallas_call(
        functools.partial(_bwd_v2, m=m, hn=hn, use_ones_dot=use_ones_dot,
                          chunks=chunks),
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
    )(g, xk2, x02, w2, ones_blk)


def main():
    rng = np.random.default_rng(0)
    xk = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)), jnp.float32).astype(jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)

    ref_out = jax.jit(K._cin_bwd_pallas)(xk, x0, w2, g)
    out = jax.jit(lambda *a: bwd_v2(*a, 256, False, 1))(xk, x0, w2, g)
    errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            for a, b in zip(out, ref_out)]
    print(f"v2 rowsum-gx0 max abs err vs current kernel: {errs}")

    timeit("bwd current tr=256", K._cin_bwd_pallas, xk, x0, w2, g)
    for tr, uo, ch in [(256, False, 1), (512, True, 2), (512, False, 2),
                       (512, True, 4), (1024, True, 4)]:
        label = f"bwd v2 tr={tr} ones={uo} chunks={ch}"
        try:
            timeit(label, lambda a, b, c, d, tr=tr, uo=uo, ch=ch:
                   bwd_v2(a, b, c, d, tr, uo, ch), xk, x0, w2, g)
        except Exception as ex:
            print(f"{label} FAILED: {str(ex)[:140]}")


if __name__ == "__main__":
    main()
