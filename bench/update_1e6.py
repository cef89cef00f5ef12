#!/usr/bin/env python
"""Isolated packed Adagrad sweep update at vocab-1e6 shapes (b=16,384).
State-threaded chained timing with donation (the generic timeit harness
keeps k undonated 5GB states alive and OOMs HBM)."""

from __future__ import annotations

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

from recmodels_tpu.embedding import pallas_gather, pallas_update

B, NS, DIM = 16384, 26, 17
VOCAB = 1_000_000
ROWS = NS * VOCAB
TR = 1024
ROWS_P = -(-ROWS // TR) * TR
N = B * NS


def main():
    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, ROWS, size=(N,)).astype(np.int32))
    sorted_ids = jnp.asarray(ids)
    grads = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32)).astype(jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(ROWS_P, DIM)).astype(np.float32))
    packed = pallas_gather.pack(table, TR)
    del table
    packed_acc = pallas_gather.pack(jnp.full((ROWS_P, DIM), 0.1, jnp.float32), TR)

    def chain(k):
        @jax.jit
        def run(t, a, sids, g):
            for _ in range(k):
                t, a = pallas_update.sorted_adagrad_update_packed(
                    t, a, sids, g, 0.01, 1e-8, tb=tb)
            return t, a, jnp.sum(t[0, 0, :8])
        return run

    f1, f8 = chain(1), chain(8)

    def run(f, t, a):
        t0 = time.time()
        t, a, s = f(t, a, sorted_ids, grads)
        float(s)
        return time.time() - t0, t, a

    _, packed, packed_acc = run(f1, packed, packed_acc)  # compile
    _, packed, packed_acc = run(f8, packed, packed_acc)
    t1s, t8s = [], []
    for _ in range(3):
        dt, packed, packed_acc = run(f1, packed, packed_acc)
        t1s.append(dt)
        dt, packed, packed_acc = run(f8, packed, packed_acc)
        t8s.append(dt)
    dt = (min(t8s) - min(t1s)) / 7
    print(f"update_sweep @1e6 tb={tb}: {1000*dt:7.3f} ms")


if __name__ == "__main__":
    main()
