#!/usr/bin/env python
"""Micro-bench the sparse-update path's building blocks on TPU to decide the
update strategy (sort+dedup+scatter vs dense-grad scatter-add + full-table
elementwise)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.embedding.optim import dedup_segment_sum

ROWS, DIM, N = 2_600_000, 16, 4096 * 26


def timed(fn, carry, k=20):
    def loop(c, _):
        return fn(c), None

    def make_run(length):
        @jax.jit
        def run(c):
            c2, _ = jax.lax.scan(loop, c, None, length=length)
            return c2

        return run

    run_k = make_run(k)
    run_3k = make_run(3 * k)

    def fetch(c):
        return float(jax.tree.leaves(c)[0].ravel()[0])

    fetch(run_k(carry)); fetch(run_3k(carry))
    t0 = time.time(); fetch(run_k(carry)); t1 = time.time() - t0
    t0 = time.time(); fetch(run_3k(carry)); t2 = time.time() - t0
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3  # ms


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated item keys to run")
    opts = ap.parse_args()
    only = set(opts.only.split(",")) if opts.only else None
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, ROWS, size=(N,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(ROWS, DIM)).astype(np.float32))
    acc = jnp.abs(table) + 0.1
    r = {}

    def want(key):
        return only is None or key in only

    def rec(key, val_fn):
        if not want(key):
            return
        r[key] = round(val_fn(), 3)
        print(f"{key}: {r[key]}", flush=True)

    rec("argsort_ms", lambda: timed(lambda c: c + ids[jnp.argsort(ids)][0].astype(jnp.float32), jnp.zeros(())))
    rec("dedup_ms", lambda: timed(
        lambda c: c + dedup_segment_sum(ids, grads, ROWS)[1][0, 0], jnp.zeros(())
    ))

    uids, gsum, _ = dedup_segment_sum(ids, grads, ROWS)

    def scat_set(c):
        t = table.at[uids].set(gsum, mode="drop")
        return c + t[0, 0]

    rec("scatter_set_ms", lambda: timed(scat_set, jnp.zeros(())))

    # sorted+unique variant: tail sentinels made distinct and ascending
    n = uids.shape[0]
    uids_u = jnp.where(uids >= ROWS, ROWS + jnp.arange(n, dtype=jnp.int32), uids)

    def scat_set_hint(c):
        t = table.at[uids_u].set(gsum, mode="drop", indices_are_sorted=True, unique_indices=True)
        return c + t[0, 0]

    rec("scatter_set_sorted_unique_ms", lambda: timed(scat_set_hint, jnp.zeros(())))

    def gath(c):
        g = acc.at[uids_u].get(mode="fill", fill_value=0.0, indices_are_sorted=True, unique_indices=True)
        return c + g[0, 0]

    rec("gather_hint_ms", lambda: timed(gath, jnp.zeros(())))

    def dense_grad_build(c):
        G = jnp.zeros((ROWS, DIM), jnp.float32).at[ids].add(grads)
        return c + G[0, 0]

    rec("dense_grad_scatter_add_ms", lambda: timed(dense_grad_build, jnp.zeros(())))

    def dense_adagrad(c_state):
        t, a, c = c_state
        G = jnp.zeros((ROWS, DIM), jnp.float32).at[ids].add(grads)
        a = a + G * G
        t = t - 0.01 * G / (jnp.sqrt(a) + 1e-8)
        return (t, a, c + t[0, 0])

    rec("dense_adagrad_full_ms", lambda: timed(dense_adagrad, (table, acc, jnp.zeros(()))))

    # sparse adagrad with hints end-to-end
    def sparse_hint(c_state):
        t, a, c = c_state
        u, g, _ = dedup_segment_sum(ids, grads, ROWS)
        u = jnp.where(u >= ROWS, ROWS + jnp.arange(n, dtype=jnp.int32), u)
        arows = a.at[u].get(mode="fill", fill_value=0.1, indices_are_sorted=True, unique_indices=True)
        anew = arows + g * g
        delta = -0.01 * g / (jnp.sqrt(anew) + 1e-8)
        a = a.at[u].set(anew, mode="drop", indices_are_sorted=True, unique_indices=True)
        t = t.at[u].add(delta, mode="drop", indices_are_sorted=True, unique_indices=True)
        return (t, a, c + t[0, 0])

    rec("sparse_adagrad_hint_full_ms", lambda: timed(sparse_hint, (table, acc, jnp.zeros(()))))

    r.update(rows=ROWS, dim=DIM, n_ids=N, device=str(jax.devices()[0]))
    print(json.dumps(r))


if __name__ == "__main__":
    main()
