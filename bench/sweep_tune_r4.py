#!/usr/bin/env python
"""Round-4 tuning race for the two table-sweep kernels at the flagship
shape (2.6M x 17 f32 master, 426k sorted ids): tile rows TR, gather chunk
TP, gather pipeline depth NBUF, update tiles-per-step tb / chunk tc."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.embedding import pallas_gather as G
from recmodels_tpu.embedding import pallas_update as U
from profile_cin import timeit

R_ROWS = 2_600_960  # 26 slots x 1e5 vocab padded -> multiple of 2048
D = 17
N = 425_984  # 16384 * 26


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((R_ROWS, D)) * 0.01, jnp.float32)
    acc = jnp.full((R_ROWS, D), 0.1, jnp.float32)
    ids = np.sort(rng.integers(0, R_ROWS, size=N)).astype(np.int32)
    ids = jnp.asarray(ids)
    grads = jnp.asarray(rng.standard_normal((N, D)) * 0.01, jnp.bfloat16)

    packs = {}
    for tr in (1024, 2048):
        packs[tr] = jax.block_until_ready(G.pack(table, tr))
        packs[(tr, "acc")] = jax.block_until_ready(G.pack(acc, tr))

    print("--- gather (current: tr=1024 tp=512 nbuf=8) ---")
    for tr in (1024, 2048):
        for tp in (512, 1024):
            for nbuf in (4, 8):
                G.NBUF = nbuf
                try:
                    timeit(f"gather tr={tr} tp={tp} nbuf={nbuf}",
                           lambda p, i, tp=tp: G.sorted_gather(p, i, jnp.bfloat16, tp),
                           packs[tr], ids)
                except Exception as ex:
                    print(f"gather tr={tr} tp={tp} nbuf={nbuf} FAILED: {str(ex)[:110]}")
    G.NBUF = 8

    print("--- update (current: tr=1024 tc=512 tb=8) ---")
    for tr in (1024, 2048):
        for tc in (512, 1024):
            for tb in (4, 8, 16):
                try:
                    timeit(f"update tr={tr} tc={tc} tb={tb}",
                           lambda t, a, i, g, tc=tc, tb=tb:
                           U.sorted_adagrad_update_packed(t, a, i, g, 0.01, 1e-8, tc, tb),
                           packs[tr], packs[(tr, "acc")], ids, grads)
                except Exception as ex:
                    print(f"update tr={tr} tc={tc} tb={tb} FAILED: {str(ex)[:110]}")


if __name__ == "__main__":
    main()
