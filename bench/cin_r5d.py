#!/usr/bin/env python
"""Round-5 CIN structural race: the pair-pool (Q) formulation.

Observation: the fused forward's biggest dot (t2 = x1 @ W2, 218M MAC/tile)
and the m-term fold exist ONLY to produce the pool p2 — x2 never leaves
the kernel. Reassociating the pool:

    p2[b,n] = sum_{r in b, j,k} x0[r,j] x1[r,k] W2[k,(j,n)]
            = sum_{(j,k)} Q[b,(j,k)] * W2R[(j,k),n]

with Q[b,(j,k)] = sum_{d} x0[(b,d),j] * x1[(b,d),k] — an EXAMPLE-RANK
pair-pool computed by a narrow-first one-hot d-sum dot (DS[b,r] =
1[r//d==b]; [nb,tr]@[tr,m*h1] = 54.5M) over the z build the backward
already pays, and W2R[(j,k),n] = W2[k,(j,n)] a static row-concat of w2's
column blocks (built once in scratch). Forward inventory: 290M -> ~140M
MAC/tile, fold VPU deleted.

If the forward SAVES Q (109MB bf16 at the flagship), the backward's gw2
dot (218M/tile) collapses to an example-rank XLA einsum outside the
kernel: gw2[k,(j,n)] = sum_b g2p[b,n] Q[b,(j,k)] — 7 GMAC total. The
backward kernel drops gw2 + the z build entirely.

Race: production fwd+bwd composite vs Q-form composite (fwd_q kernel +
bwd_noq kernel + XLA gw2 einsum), matched outputs (p1, p2, x1, gx0, gw1,
gw2).
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
VMEM = 64 * 2**20


def _ds_onehot(nb, tr, d):
    ds = np.zeros((nb, tr), np.float32)
    for r in range(tr):
        ds[r // d, r] = 1.0
    return jnp.asarray(ds, jnp.bfloat16)


def fwd_q_call(x02, w1, w2, d, tr=512):
    rows, m = x02.shape
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    mp = -(-m * m // 128) * 128
    nb = tr // d
    ea, eb, _, _ = K._cin2_onehots(m)
    w1p = K._w1_pairs(w1, m, h1, mp)
    ds = _ds_onehot(nb, tr, d)

    def kern(x0_ref, w1p_ref, w2_ref, ea_ref, eb_ref, ds_ref,
             x1_ref, p1_ref, p2_ref, q_ref, w2r_s):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            # W2R[(j,k), n] = w2[k, (j,n)]: row-concat of w2's column
            # blocks — no transposes
            w2r_s[:] = jnp.concatenate(
                [w2_ref[:, j * h2 : (j + 1) * h2] for j in range(m)],
                axis=0,
            )

        x0 = x0_ref[:]
        e1 = jnp.dot(x0, ea_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        e2 = jnp.dot(x0, eb_ref[:], preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x1 = jnp.dot(e1 * e2, w1p_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
        x1_ref[:] = x1
        # pair stream z[r,(j,k)] = x0[r,j]*x1[r,k]
        z = jnp.concatenate(
            [x1 * x0[:, j : j + 1] for j in range(m)], axis=1
        )
        qt = jnp.dot(ds_ref[:], z, preferred_element_type=jnp.float32)
        q = qt.astype(jnp.bfloat16)
        q_ref[:] = q
        p2_ref[:] = jnp.dot(
            q, w2r_s[:], preferred_element_type=jnp.float32
        ).astype(p2_ref.dtype)
        p1_ref[:] = jnp.sum(x1.reshape(nb, d, h1).astype(jnp.float32), axis=1
                            ).astype(p1_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, m * h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tr), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, m * h1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, h1), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, h2), x02.dtype),
            jax.ShapeDtypeStruct((rows // d, m * h1), jnp.bfloat16),
        ],
        scratch_shapes=[pltpu.VMEM((m * h1, h2), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(x02, w1p, w2, ea, eb, ds)


def bwd_noq_call(x02, x1, w1, w2, g1p, g2p, d, tr=512):
    """The fused backward minus gw2 and the z build (gw2 rides the XLA
    example-rank einsum over the saved Q)."""
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
             gx0_ref, gw1_ref, wp_s, gw1_s):
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

        g1 = jnp.broadcast_to(g1p_ref[:].reshape(nb, 1, h1), (nb, d, h1)
                              ).reshape(tr, h1)
        t1p = jnp.dot(
            g2p_ref[:], wp_s[:], preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        t1 = jnp.broadcast_to(
            t1p.reshape(nb, 1, m * h1), (nb, d, m * h1)
        ).reshape(tr, m * h1)

        gx1 = None
        q_parts = []
        for i in range(m):
            t1_i = t1[:, i * h1 : (i + 1) * h1]
            x0_i = x0[:, i : i + 1]
            contrib = t1_i.astype(jnp.float32) * x0_i.astype(jnp.float32)
            gx1 = contrib if gx1 is None else gx1 + contrib
            q_parts.append(t1_i * xk)
        gx1 = (gx1 + g1.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate(q_parts, axis=1)
        gx0_a = jnp.dot(q, ones_ref[:], preferred_element_type=jnp.float32)

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

        @pl.when(jnp.logical_not(first))
        def _():
            gw1_s[:] += gw1_step

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            gw1_ref[:] = gw1_s[:].T

    gx0, gw1p = pl.pallas_call(
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, m), x02.dtype),
            jax.ShapeDtypeStruct((mp, h1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h2, m * h1), jnp.bfloat16),
            pltpu.VMEM((h1, mp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )(g1p, g2p, x02, x1, w2, w1pt, ea, eb, oa, ob, ones_blk)
    gw1 = gw1p[: m * m, :].reshape(m, m * h1)
    return gx0, gw1.astype(w1.dtype)


def q_composite(x02, w1, w2, g1p, g2p, d):
    x1, p1, p2, q = fwd_q_call(x02, w1, w2, d)
    gx0, gw1 = bwd_noq_call(x02, x1, w1, w2, g1p, g2p, d)
    m = x02.shape[1]
    h1 = w1.shape[1] // m
    h2 = w2.shape[1] // m
    # gw2[k,(j,n)] = sum_b g2p[b,n] Q[b,(j,k)] — example-rank, 7 GMAC
    q3 = q.reshape(q.shape[0], m, h1)
    gw2 = jnp.einsum("bjk,bn->kjn", q3, g2p,
                     preferred_element_type=jnp.float32).reshape(h1, m * h2)
    return p1, p2, x1, gx0, gw1, gw2.astype(w2.dtype)


def prod_composite(x02, w1, w2, g1p, g2p, d):
    x1, p1, p2 = K._cin2_fwd_call(x02, w1, w2, d)
    gx0, gw1, gw2 = K._cin2_bwd_call(x02, x1, w1, w2, g1p, g2p, d)
    return p1, p2, x1, gx0, gw1, gw2


def _check_close(a, b, rtol=5e-2, atol=5e-2, max_viol_frac=1e-5):
    viol = np.abs(a - b) > (atol + rtol * np.abs(b))
    frac = viol.mean()
    if frac > max_viol_frac:
        raise AssertionError(f"violators {viol.sum()}/{viol.size} ({frac:.2e})")


def main():
    rng = np.random.default_rng(0)
    x02 = jnp.asarray(rng.normal(size=(R, M)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, size=(M, M * H1)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, size=(H1, M * H2)), jnp.bfloat16)
    g1p = jnp.asarray(rng.normal(size=(R // D, H1)), jnp.bfloat16)
    g2p = jnp.asarray(rng.normal(size=(R // D, H2)), jnp.bfloat16)

    ref = jax.jit(functools.partial(prod_composite, d=D))(x02, w1, w2, g1p, g2p)
    got = jax.jit(functools.partial(q_composite, d=D))(x02, w1, w2, g1p, g2p)
    names = ["p1", "p2", "x1", "gx0", "gw1", "gw2"]
    for n, a, b in zip(names, got, ref):
        try:
            _check_close(np.asarray(a, np.float32), np.asarray(b, np.float32))
            print(f"  {n}: ok")
        except AssertionError as e:
            print(f"  {n}: differs from prod: {e}")

    # f32-oracle distances: both paths must sit at comparable bf16 distance
    # from the true math (the repo's TPU-test standard). Oracle uses the
    # SHARED x1 (bf16, identical in both paths) cast f32.
    def oracle(x02, w1, w2, g1p, g2p):
        x1 = got[2].astype(jnp.float32)
        x0r = x02.reshape(-1, D, M).astype(jnp.float32)
        x1r = x1.reshape(-1, D, H1)
        qf = jnp.einsum("bdj,bdk->bjk", x0r, x1r)
        w3 = w2.astype(jnp.float32).reshape(H1, M, H2)
        p2 = jnp.einsum("bjk,kjn->bn", qf, w3)
        gw2 = jnp.einsum("bjk,bn->kjn", qf, g2p.astype(jnp.float32)
                         ).reshape(H1, M * H2)
        return p2, gw2
    p2_o, gw2_o = jax.jit(oracle)(x02, w1, w2, g1p, g2p)
    for n, idx, o in (("p2", 1, p2_o), ("gw2", 5, gw2_o)):
        o = np.asarray(o, np.float32)
        scale = np.abs(o).mean()
        for tag, arr in (("prod", ref[idx]), ("qform", got[idx])):
            err = np.abs(np.asarray(arr, np.float32) - o)
            print(f"  {n} vs f32 oracle [{tag}]: max {err.max():.4f} "
                  f"mean {err.mean():.5f} (|oracle| mean {scale:.2f})")

    timeit("prod fwd+bwd", functools.partial(prod_composite, d=D),
           x02, w1, w2, g1p, g2p)
    timeit("Q-form fwd+bwd+einsum", functools.partial(q_composite, d=D),
           x02, w1, w2, g1p, g2p)


if __name__ == "__main__":
    main()
