#!/usr/bin/env python
"""Vocab-1e6 gather/update crossover race (VERDICT r4 next #3).

At vocab 1e5 (2.6M stacked rows) the sorted sweep gather beats XLA's
per-row gather 4.1ms -> 1.45ms. Both embedding kernels are fixed-cost
full-table sweeps, so at vocab 1e6 (26.2M rows, ~25.6k tiles) their cost
grows ~10x while ids stay 426k (~17 ids/tile). Race, isolated at the 1e6
shapes (b=16,384):

  sweep_gather     packed [25.6k, 24, 1024] master, sorted stream
  xla_gather       2-D [26.2M, 17] f32 master, random row take + bf16 cast
  update_sweep     packed Adagrad sweep (the full-table r/w floor)

Decides whether a high-vocab crossover (2-D master + XLA gather + 2-D
sweep update) is worth wiring, or whether the honest answer stays
"shard it: tiles/chip = vocab/N at 1.09x tax".
"""

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

from recmodels_tpu.embedding import pallas_gather, pallas_update
from profile_cin import timeit

B, NS, DIM = 16384, 26, 17
VOCAB = 1_000_000
ROWS = NS * VOCAB  # stacked; pad to tile multiple
TR = 1024
ROWS_P = -(-ROWS // TR) * TR
N = B * NS


def main():
    # tables as ARGUMENTS, not closure constants: capturing 2.5GB constants
    # broke the remote-compile transport (Broken pipe) on the first attempt
    rng = np.random.default_rng(0)
    print(f"rows={ROWS_P} ({ROWS_P // TR} tiles), ids={N}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    ids = np.sort(rng.integers(0, ROWS, size=(N,)).astype(np.int32))
    sorted_ids = jnp.asarray(ids)
    grads = jnp.asarray(rng.normal(size=(N, DIM)).astype(np.float32)).astype(jnp.bfloat16)

    def sweep(sids, packed):
        return pallas_gather.sorted_gather(packed, sids, out_dtype=jnp.bfloat16)

    def xla_gather(sids, table):
        return jnp.take(table, sids, axis=0).astype(jnp.bfloat16)

    if which in ("all", "gather"):
        table = jnp.asarray(rng.normal(size=(ROWS_P, DIM)).astype(np.float32))
        packed = pallas_gather.pack(table, TR)
        a = np.asarray(jax.jit(sweep)(sorted_ids, packed))[:, :DIM]
        b = np.asarray(jax.jit(xla_gather)(sorted_ids, table))
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
        timeit("sweep_gather @1e6", sweep, sorted_ids, packed)
        timeit("xla_gather  @1e6", xla_gather, sorted_ids, table)
        del table, packed, a, b

    def upd(sids, g, packed, packed_acc):
        return pallas_update.sorted_adagrad_update_packed(
            packed, packed_acc, sids, g, 0.01, 1e-8)

    if which in ("all", "update"):
        table = jnp.asarray(rng.normal(size=(ROWS_P, DIM)).astype(np.float32))
        packed = pallas_gather.pack(table, TR)
        packed_acc = pallas_gather.pack(jnp.full((ROWS_P, DIM), 0.1, jnp.float32), TR)
        del table
        timeit("update_sweep @1e6", upd, sorted_ids, grads, packed, packed_acc)


if __name__ == "__main__":
    main()
