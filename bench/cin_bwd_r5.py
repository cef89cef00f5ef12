#!/usr/bin/env python
"""Round-5 fused CIN backward races (VERDICT r4 next #2: 5.63ms -> ~4ms floor).

Candidates over the production `_cin2_bwd_call` form (flagship shapes,
R=262144, m=26, h1=h2=128, tr=512):

  * vpu_gx0a — gx0_a[r, j] = <t1_j[r], xk[r]> is 26 row-wise length-128
    inner products (1.7M real MACs), but the production form computes it as
    a [tr, 3328] @ [3328, 26] MXU dot: 3328-deep onto 26 lanes = ~218M
    MAC-equivalents at 20% lane efficiency, AND materializes q=concat(t1_i
    * xk) [tr, 3328] in VMEM just to feed it. Candidate: 3-D reshape +
    VPU multiply + minor-axis reduction — no q, no dot.
  * tr1024 — halve grid length (fixed per-tile costs, pipeline ramps);
    VMEM transients double (raise vmem_limit_bytes).
  * both combined.
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

R, M, H1, H2, D = 262144, 26, 128, 128, 16


def bwd_variant(x02, x1, w1, w2, g1p, g2p, d, tr, vpu_gx0a, chunks=2,
                vmem_mb=64):
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    mp = -(-m * m // 128) * 128
    nb = tr // d
    ea, eb, oa, ob = K._cin2_onehots(m)
    w1pt = K._w1_pairs(w1, m, h1, mp).T
    ones_blk = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), h1, axis=0)

    def kern(g1p_ref, g2p_ref, x0_ref, x1_ref, w2_ref, w1pt_ref, ea_ref,
             eb_ref, oa_ref, ob_ref, ones_ref,
             gx0_ref, gw1_ref, gw2_ref, wp_s, gw1_s, gw2_s):
        x0 = x0_ref[:]
        xk = x1_ref[:]
        step = pl.program_id(0)
        first = step == 0

        @pl.when(first)
        def _():
            wp_s[:] = jnp.concatenate(
                [w2_ref[:, i * h2 : (i + 1) * h2].T for i in range(m)],
                axis=1,
            )

        g2 = jnp.broadcast_to(g2p_ref[:].reshape(nb, 1, h2), (nb, d, h2)
                              ).reshape(tr, h2)
        g1 = jnp.broadcast_to(g1p_ref[:].reshape(nb, 1, h1), (nb, d, h1)
                              ).reshape(tr, h1)

        cw = (m * h1) // chunks
        t1_parts = [
            jnp.dot(
                g2, wp_s[:, c * cw : (c + 1) * cw],
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            for c in range(chunks)
        ]
        t1 = jnp.concatenate(t1_parts, axis=1) if chunks > 1 else t1_parts[0]
        gx1 = None
        z_parts = []
        q_parts = []
        for i in range(m):
            t1_i = t1[:, i * h1 : (i + 1) * h1]
            x0_i = x0[:, i : i + 1]
            contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
            gx1 = contrib if gx1 is None else gx1 + contrib
            if not vpu_gx0a:
                q_parts.append(t1_i * xk)
            z_parts.append(xk * x0_i)
        gx1 = (gx1 + g1.astype(jnp.float32)).astype(jnp.bfloat16)
        if vpu_gx0a:
            # bf16 products (same rounding as the production q elements),
            # f32 accumulate over the minor axis
            t1r = t1.reshape(tr, m, h1)
            gx0_a = jnp.sum(
                (t1r * xk[:, None, :]).astype(jnp.float32), axis=2,
            )
        else:
            q = jnp.concatenate(q_parts, axis=1)
            gx0_a = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32)
        z = jnp.concatenate(z_parts, axis=1)
        gw2_step = jax.lax.dot_general(g2, z, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        gp = jnp.dot(
            gx1, w1pt_ref[:], preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        gx0_b = (
            jnp.dot(gp * e2, oa_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(gp * e1, ob_ref[:], preferred_element_type=jnp.float32)
        )
        gw1_step = jax.lax.dot_general(
            gx1, e1 * e2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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
            gw1_ref[:] = gw1_s[:].T
            gw2_ref[:] = jnp.concatenate(
                [gw2_s[:, i * h1 : (i + 1) * h1].T for i in range(m)], axis=1
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
            pl.BlockSpec((h1, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * h1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((mp, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, m * h2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h2, m * h1), jnp.bfloat16),
            pltpu.VMEM((h1, mp), jnp.float32),
            pltpu.VMEM((h2, m * h1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20),
    )(g1p, g2p, x02, x1, w2, w1pt, ea, eb, oa, ob, ones_blk)


def main():
    rng = np.random.default_rng(0)
    x02 = jnp.asarray(rng.normal(size=(R, M)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, size=(M, M * H1)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, size=(H1, M * H2)), jnp.bfloat16)
    x1 = jnp.asarray(rng.normal(size=(R, H1)), jnp.bfloat16)
    g1p = jnp.asarray(rng.normal(size=(R // D, H1)), jnp.bfloat16)
    g2p = jnp.asarray(rng.normal(size=(R // D, H2)), jnp.bfloat16)

    base = functools.partial(K._cin2_bwd_call, d=D)
    ref = jax.jit(lambda *a: base(*a))(x02, x1, w1, w2, g1p, g2p)

    variants = {
        "prod(tr512)": dict(tr=512, vpu_gx0a=False),
        "vpu_gx0a(tr512)": dict(tr=512, vpu_gx0a=True),
        "prod(tr1024)": dict(tr=1024, vpu_gx0a=False, vmem_mb=110),
        "vpu_gx0a(tr1024)": dict(tr=1024, vpu_gx0a=True, vmem_mb=110),
    }
    for name, kw in variants.items():
        fn = functools.partial(bwd_variant, d=D, **kw)
        try:
            got = jax.jit(lambda *a: fn(*a))(x02, x1, w1, w2, g1p, g2p)
            # variants emit gw1 in pairs layout [mp, h1]; production returns
            # the flat [m, m*h1] — convert before comparing
            got = (got[0], np.asarray(got[1])[: M * M, :].reshape(M, M * H1),
                   got[2])
            for a, b in zip(got, ref):
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=5e-2, atol=5e-2,
                )
            timeit(name, fn, x02, x1, w1, w2, g1p, g2p)
        except Exception as e:  # noqa: BLE001 - race harness: record and move on
            print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
