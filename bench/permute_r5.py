#!/usr/bin/env python
"""Round-5 permute-tax race (VERDICT r4 weak #2: the two ~0.8ms b-major <->
sorted-order row permutes "deserve a race, not an assertion").

The permutation is structured: the sorted stream is a concat of 26 per-slot
blocks, and within slot s it is a [B] permutation of that slot's rows
(slot_sorted_ids). Candidates exploit that block structure at the XLA level
(Pallas can't beat ~2ns/row random access here: a VMEM-local gather
primitive doesn't exist on v5e Mosaic, and per-row DMA issue overhead is
larger than the XLA take's per-row cost):

  flat_take        out[i] = src[inv[i]]                (production)
  slot_take        [26, B, D] take_along_axis per slot (26 smaller gathers)
  flat_scatter     out.at[order].set(src)              (scatter formulation)
  f32_take         dtype sensitivity (bf16 vs f32 rows)
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

from profile_cin import timeit

B, NS, D = 16384, 26, 17
N = B * NS


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    # realistic structured permutation: per-slot sorts of uniform ids
    ids = rng.integers(0, 100_000, size=(B, NS))
    order_2d = np.argsort(ids.T, axis=1, kind="stable").astype(np.int32)  # [NS, B]
    order = (order_2d * NS + np.arange(NS)[:, None]).reshape(-1)
    inv = np.zeros(N, np.int32)
    inv[order] = np.arange(N, dtype=np.int32)
    inv_2d = np.zeros((NS, B), np.int32)
    rows = np.repeat(np.arange(NS)[:, None], B, axis=1)
    # inv for the slot-major view: out[s, b] = src_slot[s, pos] where
    # src viewed [NS, B, D] slot-major blocks
    pos_2d = np.argsort(order_2d, axis=1).astype(np.int32)
    del rows

    inv_j = jnp.asarray(inv)
    order_j = jnp.asarray(order)
    pos_2d_j = jnp.asarray(pos_2d)

    def flat_take(src):
        return jnp.take(src, inv_j, axis=0)

    def slot_take(src):
        s3 = src.reshape(NS, B, D)
        out = jnp.take_along_axis(s3, pos_2d_j[:, :, None], axis=1)
        # emit b-major [B, NS, D] (one transpose of the block axes)
        return jnp.swapaxes(out, 0, 1).reshape(N, D)

    def flat_scatter(src):
        return jnp.zeros_like(src).at[order_j].set(src, mode="drop",
                                                   unique_indices=True)

    ref = np.asarray(jax.jit(flat_take)(src), np.float32)
    want_bmaj = np.asarray(src, np.float32)[order.argsort()]  # sanity
    np.testing.assert_array_equal(ref, np.asarray(src, np.float32)[inv])

    for name, fn in [("flat_take(bf16)", flat_take),
                     ("slot_take(bf16)", slot_take),
                     ("flat_scatter(bf16)", flat_scatter)]:
        got = np.asarray(jax.jit(fn)(src), np.float32)
        np.testing.assert_array_equal(got, ref)
        timeit(name, fn, src)

    src32 = src.astype(jnp.float32)
    timeit("flat_take(f32)", flat_take, src32)
    timeit("slot_take(f32)", slot_take, src32)


if __name__ == "__main__":
    main()
