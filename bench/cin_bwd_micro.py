#!/usr/bin/env python
"""Microbenchmark the CIN-L2-backward kernel's constituent costs: pure big
dots, pure lane-expand muls, pure concats — each as its own Pallas kernel
over the same grid — to find where the 8.5us/tile actually goes."""

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

from profile_cin import timeit

R, M, HN, HK = 262144, 26, 128, 128
VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def run(kern_body, tr, extra_scratch=()):
    def kern(g_ref, xk_ref, x0_ref, w2_ref, out_ref, *scr):
        kern_body(g_ref[:], xk_ref[:], x0_ref[:], w2_ref, out_ref, *scr)

    def f(g, xk, x0, w2):
        return pl.pallas_call(
            kern,
            grid=(R // tr,),
            in_specs=[
                pl.BlockSpec((tr, HN), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, HK), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((HK, M * HN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, HK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, HK), jnp.bfloat16),
            scratch_shapes=list(extra_scratch),
            compiler_params=VMEM,
        )(g, xk, x0, w2)
    return f


def main():
    tr = 512
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((R, HK)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HK, M * HN)) * 0.05, jnp.bfloat16)

    # 1. pure pass-through (pipeline + HBM floor)
    def b_pass(g_, xk_, x0_, w2_ref, out_ref):
        out_ref[:] = xk_

    # 2. one big NT dot vs the full flat weight: [tr,3328]x[128,3328]^T
    def b_dot_nt(g_, xk_, x0_, w2_ref, out_ref):
        u = jnp.concatenate([g_] * M, axis=1)  # stand-in wide operand
        out_ref[:] = jax.lax.dot_general(
            u, w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # 3. t1-style dot: [tr,128] @ [3328,128]^T -> [tr, 3328], then fold
    def b_dot_t1(g_, xk_, x0_, w2_ref, out_ref):
        t1 = jax.lax.dot_general(
            g_, w2_ref[:].reshape(M * HK, HN) if False else w2_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # w2 is [128, 3328]: g[tr,128] @ w2 -> [tr, 3328] (plain NN dot)
        out_ref[:] = t1[:, :HK].astype(jnp.bfloat16)

    # 4. 26 lane-expand muls ([tr,1] sublane-scalar broadcast each)
    def b_muls(g_, xk_, x0_, w2_ref, out_ref):
        acc = None
        for i in range(M):
            p = xk_ * x0_[:, i : i + 1]
            acc = p if acc is None else acc + p
        out_ref[:] = acc

    # 5. 26 muls + concat into [tr, 3328] (forces materialization)
    def b_muls_concat(g_, xk_, x0_, w2_ref, out_ref, scr):
        z = jnp.concatenate([xk_ * x0_[:, i : i + 1] for i in range(M)], axis=1)
        scr[:] = z
        out_ref[:] = scr[:, :HK]

    # 6. f32 fold (contrib-style): 26 f32 fma
    def b_fold32(g_, xk_, x0_, w2_ref, out_ref):
        acc = None
        for i in range(M):
            p = xk_.astype(jnp.float32) * x0_[:, i : i + 1].astype(jnp.float32)
            acc = p if acc is None else acc + p
        out_ref[:] = acc.astype(jnp.bfloat16)

    # 7. gw-style row-contraction dot: z^T @ g with z from scratch
    def b_dot_gw(g_, xk_, x0_, w2_ref, out_ref, zscr, gwscr):
        zscr[:] = jnp.concatenate([xk_ * x0_[:, i : i + 1] for i in range(M)], axis=1)
        gwscr[:] = jax.lax.dot_general(
            zscr[:], g_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        out_ref[:] = xk_

    for name, body, scr in [
        ("pass-through", b_pass, ()),
        ("NN dot g@w2 [tr,128]x[128,3328]", b_dot_t1, ()),
        ("NT dot wide@w2^T [tr,3328]x[128,3328]T", b_dot_nt, ()),
        ("26 bf16 muls (no concat)", b_muls, ()),
        ("26 muls + concat", b_muls_concat, (pltpu.VMEM((tr, M * HN), jnp.bfloat16),)),
        ("26 f32 fma fold", b_fold32, ()),
        ("muls+concat+gw dot", b_dot_gw,
         (pltpu.VMEM((tr, M * HN), jnp.bfloat16), pltpu.VMEM((M * HK, HN), jnp.float32))),
    ]:
        try:
            timeit(name, run(body, tr, scr), g, xk, x0, w2)
        except Exception as ex:
            print(f"{name} FAILED: {str(ex)[:130]}")


if __name__ == "__main__":
    main()
