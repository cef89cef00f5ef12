#!/usr/bin/env python
"""Scatter strategy micro-bench with NON-CONSTANT ids (fed via scan xs so
XLA cannot constant-fold sorts/scatters — the flaw in earlier probes).
Decides the embedding-update implementation."""

from __future__ import annotations

import argparse
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
K = 10


def timed_xs(step_fn, carry0, xs_small, xs_big):
    """step_fn(carry, x) -> carry. xs leading dims K and 3K."""

    def loop(c, x):
        return step_fn(c, x), None

    @jax.jit
    def run(c, xs):
        c2, _ = jax.lax.scan(loop, c, xs)
        return c2

    def fetch(c):
        return float(jax.tree.leaves(c)[0].ravel()[0])

    fetch(run(carry0, xs_small)); fetch(run(carry0, xs_big))
    t0 = time.time(); fetch(run(carry0, xs_small)); t1 = time.time() - t0
    t0 = time.time(); fetch(run(carry0, xs_big)); t2 = time.time() - t0
    return max((t2 - t1) / (2 * K), 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    rng = np.random.default_rng(0)
    ids_small = jnp.asarray(rng.integers(0, ROWS, size=(K, N)).astype(np.int32))
    ids_big = jnp.asarray(rng.integers(0, ROWS, size=(3 * K, N)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(ROWS, DIM)).astype(np.float32))
    acc = jnp.abs(table) + 0.1

    r = {}

    def rec(key, fn, carry):
        if only is not None and key not in only:
            return
        r[key] = round(timed_xs(fn, carry, ids_small, ids_big), 3)
        print(f"{key}: {r[key]}", flush=True)

    # raw duplicate-index scatter-add (current dense path)
    def f_raw(c, ids):
        g = jnp.zeros((ROWS, DIM), jnp.float32).at[ids].add(grads)
        return c + g[0, 0]

    rec("scatter_add_raw_ms", f_raw, jnp.zeros(()))

    # device argsort alone
    def f_sort(c, ids):
        return c + ids[jnp.argsort(ids)][0].astype(jnp.float32)

    rec("argsort_ms", f_sort, jnp.zeros(()))

    # full dedup
    def f_dedup(c, ids):
        u, g, _ = dedup_segment_sum(ids, grads, ROWS)
        return c + g[0, 0] + u[0].astype(jnp.float32)

    rec("dedup_ms", f_dedup, jnp.zeros(()))

    # dedup + hinted unique/sorted scatter-add into zeros
    def f_dedup_scatter(c, ids):
        u, g, _ = dedup_segment_sum(ids, grads, ROWS)
        G = jnp.zeros((ROWS, DIM), jnp.float32).at[u].add(
            g, mode="drop", indices_are_sorted=True, unique_indices=True
        )
        return c + G[0, 0]

    rec("dedup_plus_hinted_scatter_ms", f_dedup_scatter, jnp.zeros(()))

    # dedup + hinted row gather+scatter sparse adagrad (no dense G)
    def f_sparse(c_state, ids):
        t, a, c = c_state
        u, g, _ = dedup_segment_sum(ids, grads, ROWS)
        hints = dict(indices_are_sorted=True, unique_indices=True)
        arows = a.at[u].get(mode="fill", fill_value=0.1, **hints)
        anew = arows + g * g
        delta = -0.01 * g / (jnp.sqrt(anew) + 1e-8)
        a = a.at[u].set(anew, mode="drop", **hints)
        t = t.at[u].add(delta, mode="drop", **hints)
        return (t, a, c + t[0, 0])

    rec("sparse_adagrad_hinted_ms", f_sparse, (table, acc, jnp.zeros(())))

    # segment_sum formulation of the dense grad
    def f_seg(c, ids):
        G = jax.ops.segment_sum(grads, ids, num_segments=ROWS)
        return c + G[0, 0]

    rec("segment_sum_dense_ms", f_seg, jnp.zeros(()))

    r.update(rows=ROWS, dim=DIM, n_ids=N, device=str(jax.devices()[0]))
    print(json.dumps(r))


if __name__ == "__main__":
    main()
