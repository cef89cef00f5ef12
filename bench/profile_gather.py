#!/usr/bin/env python
"""Embedding-gather strategy micro-bench (round 2, VERDICT item 1).

Measures on the real chip, with NON-CONSTANT ids fed via scan xs (so XLA
cannot constant-fold), every candidate for replacing the 6.0ms XLA row
gather at the flagship shape: b=8192 x 26 slots -> N=213k ids into a
2.6M x 17 fused table (bf16 shadow).

Also probes Mosaic's native ``tpu.dynamic_gather`` (jnp.take_along_axis
inside a Pallas kernel) support and speed at several extents — if sublane
gather works at extent >= 512 it changes the whole kernel design.
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
D16 = 32
K = 8


def timed_xs(step_fn, carry0, xs_small, xs_big, k=K):
    def loop(c, x):
        return step_fn(c, x), None

    @jax.jit
    def run(c, xs):
        c2, _ = jax.lax.scan(loop, c, xs)
        return c2

    def fetch(c):
        return float(jax.tree.leaves(c)[0].ravel()[0])

    fetch(run(carry0, xs_small)); fetch(run(carry0, xs_big))
    t1 = min(
        (lambda t0: (fetch(run(carry0, xs_small)), time.time() - t0)[1])(time.time())
        for _ in range(3)
    )
    t2 = min(
        (lambda t0: (fetch(run(carry0, xs_big)), time.time() - t0)[1])(time.time())
        for _ in range(3)
    )
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3


def make_ids(rng, k):
    """[k, B, SLOTS] slot-local ids -> flat global row ids [k, N]."""
    ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
    off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
    return jnp.asarray((ids + off).reshape(k, N))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rng = np.random.default_rng(0)
    ids_s = make_ids(rng, K)
    ids_b = make_ids(rng, 3 * K)
    shadow = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32)).astype(jnp.bfloat16)
    shadow_t = shadow.T  # [17, ROWS]
    rows_small = jnp.asarray(rng.normal(size=(N, D16)).astype(np.float32)).astype(jnp.bfloat16)

    r = {}

    def rec(key, fn, carry, xs1=ids_s, xs2=ids_b, k=K):
        if only is not None and key not in only:
            return
        try:
            r[key] = round(timed_xs(fn, carry, xs1, xs2, k), 3)
        except Exception as e:  # noqa: BLE001
            r[key] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
        print(f"{key}: {r[key]}", flush=True)

    # 1. current path: XLA row gather from row-major bf16 shadow
    def f_take(c, ids):
        rws = shadow[ids]
        return c + rws[0, 0].astype(jnp.float32)

    rec("take_rowmajor_bf16_213k_ms", f_take, jnp.zeros(()))

    # 1b. f32 master gather emitting bf16 (the no-shadow path)
    master = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))

    def f_take_f32(c, ids):
        rws = master[ids].astype(jnp.bfloat16)
        return c + rws[0, 0].astype(jnp.float32)

    rec("take_f32master_bf16out_ms", f_take_f32, jnp.zeros(()))

    # 2. sorted ids XLA gather (locality effect?)
    def f_take_sorted(c, ids):
        sid = jax.lax.sort(ids)
        rws = shadow[sid]
        return c + rws[0, 0].astype(jnp.float32)

    rec("sort_plus_take_ms", f_take_sorted, jnp.zeros(()))

    # 3. sort_key_val alone
    def f_sort(c, ids):
        s, o = jax.lax.sort_key_val(ids, jnp.arange(N, dtype=jnp.int32))
        return c + s[0].astype(jnp.float32) + o[0].astype(jnp.float32)

    rec("sort_kv_213k_ms", f_sort, jnp.zeros(()))

    # 4. the unsort: random perm take on a small [N, 32] bf16 array
    def f_unsort(c, ids):
        perm = jnp.argsort(ids)  # random-ish permutation of [N]
        out = rows_small[perm]
        return c + out[0, 0].astype(jnp.float32)

    rec("unsort_take_argsort_ms", f_unsort, jnp.zeros(()))

    def f_unsort_only(c, perm):
        out = rows_small[perm]
        return c + out[0, 0].astype(jnp.float32)

    perm_s = jnp.asarray(
        np.stack([rng.permutation(N).astype(np.int32) for _ in range(K)])
    )
    perm_b = jnp.asarray(
        np.stack([rng.permutation(N).astype(np.int32) for _ in range(3 * K)])
    )
    rec("unsort_take_213k_from_213k_ms", f_unsort_only, jnp.zeros(()), perm_s, perm_b)

    # 4b. per-slot blocked unsort: 26 x [8192] perms into [26, 8192, 32]
    rows_slot = rows_small.reshape(SLOTS, B, D16)
    perm_slot_s = jnp.asarray(
        np.stack([np.stack([rng.permutation(B).astype(np.int32) for _ in range(SLOTS)]) for _ in range(K)])
    )
    perm_slot_b = jnp.asarray(
        np.stack([np.stack([rng.permutation(B).astype(np.int32) for _ in range(SLOTS)]) for _ in range(3 * K)])
    )

    def f_unsort_slot(c, perm):  # perm [26, 8192]
        out = jnp.take_along_axis(rows_slot, perm[:, :, None], axis=1)
        return c + out[0, 0, 0].astype(jnp.float32)

    rec("unsort_perslot_batched_ms", f_unsort_slot, jnp.zeros(()), perm_slot_s, perm_slot_b)

    # 4c. scatter formulation of the unsort
    def f_unsort_scatter(c, perm):
        out = jnp.zeros((N, D16), rows_small.dtype).at[perm].set(rows_small)
        return c + out[0, 0].astype(jnp.float32)

    rec("unsort_scatter_213k_ms", f_unsort_scatter, jnp.zeros(()), perm_s, perm_b)

    # 5. Mosaic native dynamic_gather probes (inside pallas kernels)
    def probe_dg(axis, s0, s1, dtype):
        x = jnp.asarray(rng.normal(size=(s0, s1)), dtype=dtype)
        extent = s0 if axis == 0 else s1
        idx = jnp.asarray(rng.integers(0, extent, size=(K, s0, s1)).astype(np.int32))
        idx_b = jnp.asarray(rng.integers(0, extent, size=(3 * K, s0, s1)).astype(np.int32))

        def kern(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

        @functools.partial(jax.jit)
        def call(i):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((s0, s1), dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)

        def f(c, i):
            return c + call(i)[0, 0].astype(jnp.float32)

        rec(f"pallas_dg_ax{axis}_{s0}x{s1}_{jnp.dtype(dtype).name}_ms", f, jnp.zeros(()), idx, idx_b)

    probe_dg(0, 8, 128, jnp.float32)
    probe_dg(0, 512, 128, jnp.float32)
    probe_dg(0, 8192, 128, jnp.float32)
    probe_dg(0, 8192, 128, jnp.bfloat16)
    probe_dg(0, 8192, 256, jnp.float32)
    probe_dg(1, 8, 128, jnp.float32)
    probe_dg(1, 8, 512, jnp.float32)

    # 6. empty-kernel grid overhead
    def probe_grid(n):
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.0001

        x = jnp.ones((128, 128), jnp.float32)

        @jax.jit
        def call(x):
            return pl.pallas_call(
                kern,
                grid=(n,),
                in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            )(x)

        def f(c, i):
            return c + call(x + c)[0, 0]

        rec(f"grid_overhead_{n}_ms", f, jnp.zeros(()), jnp.zeros((K,)), jnp.zeros((3 * K,)))

    probe_grid(416)
    probe_grid(5081)

    r.update(rows=ROWS, d=D, n_ids=N, device=str(jax.devices()[0]))
    print(json.dumps(r))


if __name__ == "__main__":
    main()
