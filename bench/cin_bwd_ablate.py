#!/usr/bin/env python
"""Ablate the fused CIN backward kernel: time the kernel with sections
removed to attribute the 12us/tile. Sections: L2-t1dot, L2-products
(q/z/contrib), L2-gw2dot, gx0a-dot, L1-part, pool-grad expands."""

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
MP = 768
VMEM = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def build(sections, tr=512, chunks=2):
    """sections: set of enabled parts."""
    m, h1, h2 = M, H1, H2
    nb = tr // D
    ea_np, eb_np, oa_np, ob_np = K._cin2_onehots_np(m)
    ea = jnp.asarray(ea_np, jnp.bfloat16); eb = jnp.asarray(eb_np, jnp.bfloat16)
    oa = jnp.asarray(oa_np, jnp.bfloat16); ob = jnp.asarray(ob_np, jnp.bfloat16)
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
            gw1_s[:] = jnp.zeros_like(gw1_s)
            gw2_s[:] = jnp.zeros_like(gw2_s)

        g2 = jnp.broadcast_to(g2p_ref[:].reshape(nb, 1, h2), (nb, D, h2)).reshape(tr, h2)
        g1 = jnp.broadcast_to(g1p_ref[:].reshape(nb, 1, h1), (nb, D, h1)).reshape(tr, h1)

        gx0_acc = jnp.zeros((tr, m), jnp.float32)
        gx1 = g1.astype(jnp.float32)
        if "t1dot" in sections:
            cw = (m * h1) // chunks
            t1_parts = [
                jax.lax.dot_general(
                    g2, wp_s[c * cw : (c + 1) * cw, :], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                for c in range(chunks)
            ]
            t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]
            if "prods" in sections:
                acc = None
                q_parts, z_parts = [], []
                for i in range(m):
                    t1_i = t1[:, i * h1 : (i + 1) * h1]
                    x0_i = x0[:, i : i + 1]
                    contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
                    acc = contrib if acc is None else acc + contrib
                    q_parts.append(t1_i * xk)
                    z_parts.append(xk * x0_i)
                gx1 = gx1 + acc
                if "gx0dot" in sections:
                    q = jnp.concatenate(q_parts, axis=1)
                    gx0_acc = gx0_acc + jnp.dot(
                        q, ones_ref[:], preferred_element_type=jnp.float32)
                if "gw2dot" in sections:
                    z = jnp.concatenate(z_parts, axis=1)
                    gw2_step = jax.lax.dot_general(
                        z, g2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    gw2_s[:] += gw2_step
        gx1b = gx1.astype(jnp.bfloat16)
        if "l1" in sections:
            e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            gp = jax.lax.dot_general(
                gx1b, w1p_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            gx0_acc = gx0_acc + (
                jnp.dot(gp * e2, oa_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(gp * e1, ob_ref[:], preferred_element_type=jnp.float32)
            )
            gw1_s[:] += jax.lax.dot_general(
                e1 * e2, gx1b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        gx0_ref[:] = gx0_acc.astype(gx0_ref.dtype)

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw1_ref[:] = gw1_s[:]
            gw2_ref[:] = jnp.concatenate(
                [gw2_s[i * h1 : (i + 1) * h1, :] for i in range(m)], axis=1
            )

    def call(x02, x1, w1p, w2, g1p, g2p):
        return pl.pallas_call(
            kern,
            grid=(R // tr,),
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
                jax.ShapeDtypeStruct((R, m), x02.dtype),
                jax.ShapeDtypeStruct((MP, h1), jnp.float32),
                jax.ShapeDtypeStruct((h1, m * h2), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((m * h1, h2), jnp.bfloat16),
                pltpu.VMEM((MP, h1), jnp.float32),
                pltpu.VMEM((m * h1, h2), jnp.float32),
            ],
            compiler_params=VMEM,
        )(g1p, g2p, x02, x1, w2, w1p, ea, eb, oa, ob, ones_blk)
    return call


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
    x1 = jnp.asarray(rng.standard_normal((R, H1)), jnp.bfloat16)
    w1p = jnp.asarray(rng.standard_normal((MP, H1)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((H1, M * H2)) * 0.05, jnp.bfloat16)
    g1p = jnp.asarray(rng.standard_normal((B, H1)), jnp.bfloat16)
    g2p = jnp.asarray(rng.standard_normal((B, H2)), jnp.bfloat16)

    FULL = {"t1dot", "prods", "gx0dot", "gw2dot", "l1"}
    cases = [
        ("full", FULL),
        ("-l1", FULL - {"l1"}),
        ("-gw2dot", FULL - {"gw2dot"}),
        ("-gx0dot", FULL - {"gx0dot"}),
        ("-prods(all L2 after t1)", {"t1dot", "l1"}),
        ("-t1dot(L2 gone)", {"l1"}),
        ("nothing", set()),
    ]
    for name, secs in cases:
        try:
            timeit(f"bwd {name}", build(frozenset(secs)), x0, x1, w1p, w2, g1p, g2p)
        except Exception as ex:
            print(f"{name} FAILED: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
