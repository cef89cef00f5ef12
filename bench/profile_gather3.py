#!/usr/bin/env python
"""Gather probe round 3: arrays passed as ARGS (not jit constants) so each
probe compiles in seconds, not minutes, through the axon tunnel.

Measures the candidate pieces for the Pallas sweep-gather redesign:
  - current XLA row gather (baseline, bf16 shadow row-major)
  - sort_key_val cost (the shared plan)
  - the unsort permute: XLA take, per-slot batched take, scatter form
  - Mosaic in-kernel take_along_axis (dynamic_gather) at several extents
"""
from __future__ import annotations

import argparse
import functools
import json
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

B, SLOTS, VOCAB, D = 8192, 26, 100_000, 17
ROWS = -(-SLOTS * VOCAB // 1024) * 1024  # 2600960
N = B * SLOTS  # 212992
K = 8


def timed(step_fn, consts, xs_small, xs_big, k=K):
    """ms per step_fn(consts, x) application, slope-timed over scan xs."""

    @jax.jit
    def run(consts, c, xs):
        def loop(c, x):
            return c + step_fn(consts, x), None

        c2, _ = jax.lax.scan(loop, c, xs)
        return c2

    c0 = jnp.zeros(())

    def fetch(xs):
        return float(run(consts, c0, xs))

    fetch(xs_small); fetch(xs_big)
    t1 = min((lambda t0: (fetch(xs_small), time.time() - t0)[1])(time.time()) for _ in range(3))
    t2 = min((lambda t0: (fetch(xs_big), time.time() - t0)[1])(time.time()) for _ in range(3))
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3


def make_ids(rng, k):
    ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
    off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
    return jnp.asarray((ids + off).reshape(k, N))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rng = np.random.default_rng(0)
    ids_s, ids_b = make_ids(rng, K), make_ids(rng, 3 * K)
    r = {}

    def rec(key, fn, consts, xs1=None, xs2=None):
        if only is not None and key not in only:
            return
        try:
            r[key] = round(timed(fn, consts, xs1 if xs1 is not None else ids_s,
                                 xs2 if xs2 is not None else ids_b), 3)
        except Exception as e:  # noqa: BLE001
            r[key] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
        print(f"{key}: {r[key]}", flush=True)

    shadow = jax.jit(lambda k: jax.random.normal(k, (ROWS, D), jnp.bfloat16))(jax.random.key(1))
    rows32 = jax.jit(lambda k: jax.random.normal(k, (N, 32), jnp.bfloat16))(jax.random.key(2))

    # 1. current XLA row gather baseline
    rec("take_rowmajor_bf16_213k", lambda t, ids: t[ids][0, 0].astype(jnp.float32), shadow)

    # 2. sort_key_val
    def f_sort(_, ids):
        s, o = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
        return (s[0] + o[0]).astype(jnp.float32)

    rec("sort_kv_213k", f_sort, jnp.zeros(()))

    # 3. unsort candidates on [N, 32] bf16
    perm_s = jnp.asarray(np.stack([rng.permutation(N).astype(np.int32) for _ in range(K)]))
    perm_b = jnp.asarray(np.stack([rng.permutation(N).astype(np.int32) for _ in range(3 * K)]))
    rec("unsort_take_213k", lambda t, p: t[p][0, 0].astype(jnp.float32), rows32, perm_s, perm_b)
    rec(
        "unsort_scatter_213k",
        lambda t, p: jnp.zeros_like(t).at[p].set(t)[0, 0].astype(jnp.float32),
        rows32, perm_s, perm_b,
    )

    # 3b. per-slot batched unsort: [26, 8192, 32] with [26, 8192] perms
    rows_slot = rows32.reshape(SLOTS, B, 32)
    ps_s = jnp.asarray(np.stack([np.stack([rng.permutation(B).astype(np.int32)
                                           for _ in range(SLOTS)]) for _ in range(K)]))
    ps_b = jnp.asarray(np.stack([np.stack([rng.permutation(B).astype(np.int32)
                                           for _ in range(SLOTS)]) for _ in range(3 * K)]))
    rec(
        "unsort_perslot_take",
        lambda t, p: jnp.take_along_axis(t, p[:, :, None], axis=1)[0, 0, 0].astype(jnp.float32),
        rows_slot, ps_s, ps_b,
    )

    # 4. Mosaic in-kernel take_along_axis (dynamic_gather) probes
    def probe_dg(key, s0, s1, dtype, n_reps):
        """gather s0 rows from a [s0, s1] VMEM block, repeated n_reps via grid."""
        x = jax.jit(lambda k: jax.random.normal(k, (n_reps, s0, s1), dtype))(jax.random.key(3))
        idx_s = jnp.asarray(rng.integers(0, s0, size=(K, n_reps, s0)).astype(np.int32))
        idx_b = jnp.asarray(rng.integers(0, s0, size=(3 * K, n_reps, s0)).astype(np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[0], i_ref[0][:, None], axis=0)[None]

        def call(t, i):
            out = pl.pallas_call(
                kern,
                grid=(n_reps,),
                in_specs=[
                    pl.BlockSpec((1, s0, s1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, s0), lambda g: (g, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, s0, s1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_reps, s0, s1), dtype),
            )(t, i)
            return out[0, 0, 0].astype(jnp.float32)

        rec(key, call, x, idx_s, idx_b)

    probe_dg("pallas_dg_8192x32_bf16_x26", 8192, 32, jnp.bfloat16, 26)
    probe_dg("pallas_dg_8192x128_f32_x1", 8192, 128, jnp.float32, 1)
    probe_dg("pallas_dg_512x32_bf16_x416", 512, 32, jnp.bfloat16, 416)

    r.update(rows=ROWS, d=D, n_ids=N, device=str(jax.devices()[0]))
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
