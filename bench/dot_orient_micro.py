#!/usr/bin/env python
"""Micro: cost of dot_general orientations inside a Mosaic kernel at the
CIN backward's shapes. NN [512,128]@[128,768]; NT [512,768]x[768,... etc.
If non-NN orientations materialize VREG transposes, reorient the kernels
(store weights transposed; accumulate gw transposed)."""

from __future__ import annotations

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

R, TR = 262144, 512
VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def run(body, wshape):
    def kern(x_ref, w_ref, o_ref, acc_s):
        body(x_ref[:], w_ref, o_ref, acc_s)

    def f(x, w):
        return pl.pallas_call(
            kern,
            grid=(R // TR,),
            in_specs=[
                pl.BlockSpec((TR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(wshape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((768, 128), jnp.float32)],
            compiler_params=VMEM,
        )(x, w)
    return f


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, 128)), jnp.bfloat16)
    w_nm = jnp.asarray(rng.standard_normal((128, 768)) * 0.05, jnp.bfloat16)
    w_mn = jnp.asarray(rng.standard_normal((768, 128)) * 0.05, jnp.bfloat16)

    # NN: t = x @ w  [512,128]@[128,768] -> [512,768], fold back via slice
    def b_nn(x_, w_ref, o_ref, acc):
        t = jnp.dot(x_, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = (t[:, :128] + t[:, 128:256]).astype(jnp.bfloat16)

    # NT: t = x @ w^T with w [768,128]  (contract lanes/lanes)
    def b_nt(x_, w_ref, o_ref, acc):
        t = jax.lax.dot_general(x_, w_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:] = (t[:, :128] + t[:, 128:256]).astype(jnp.bfloat16)

    # TN (row contraction): g = x^T-ish: [768-wide u]^T ... emulate gw:
    # u [512, 768] built by 6 lane-copies of x... cheap stand-in: concat
    def b_tn(x_, w_ref, o_ref, acc, *, store):
        u = jnp.concatenate([x_] * 6, axis=1)  # [512, 768]
        gw = jax.lax.dot_general(u, x_, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [768,128]
        acc[:] = gw if store else acc[:] + gw
        o_ref[:] = x_

    # TN via explicit transpose then NN
    def b_tn_tr(x_, w_ref, o_ref, acc, *, store):
        u = jnp.concatenate([x_] * 6, axis=1)
        ut = u.T  # explicit relayout
        gw = jnp.dot(ut, x_, preferred_element_type=jnp.float32)
        acc[:] = gw if store else acc[:] + gw
        o_ref[:] = x_

    import functools
    timeit("NN  x@w [128,768]", run(b_nn, (128, 768)), x, w_nm)
    timeit("NT  x@w^T, w [768,128]", run(b_nt, (768, 128)), x, w_mn)
    timeit("TN  u^T@x (contract r)", run(functools.partial(b_tn, store=False), (128, 768)), x, w_nm)
    timeit("TN explicit u.T then NN", run(functools.partial(b_tn_tr, store=False), (128, 768)), x, w_nm)
    # concat-only control for the TN cases
    def b_concat(x_, w_ref, o_ref, acc):
        u = jnp.concatenate([x_] * 6, axis=1)
        o_ref[:] = u[:, :128]
    timeit("concat-only control", run(b_concat, (128, 768)), x, w_nm)


if __name__ == "__main__":
    main()
