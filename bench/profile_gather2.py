#!/usr/bin/env python
"""Gather probe round 2: XLA layout tricks for per-row gather cost."""
from __future__ import annotations
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, SLOTS, VOCAB, D = 8192, 26, 100_000, 17
ROWS = -(-SLOTS * VOCAB // 1024) * 1024
N = B * SLOTS
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
    t1 = min((lambda t0: (fetch(run(carry0, xs_small)), time.time()-t0)[1])(time.time()) for _ in range(3))
    t2 = min((lambda t0: (fetch(run(carry0, xs_big)), time.time()-t0)[1])(time.time()) for _ in range(3))
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3

def make_ids(rng, k):
    ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
    off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
    return jnp.asarray((ids + off).reshape(k, N))

def main():
    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    rng = np.random.default_rng(0)
    ids_s, ids_b = make_ids(rng, K), make_ids(rng, 3 * K)
    r = {}
    def rec(key, fn, carry, xs1=None, xs2=None):
        if only is not None and key not in only:
            return
        try:
            r[key] = round(timed_xs(fn, carry, xs1 if xs1 is not None else ids_s,
                                    xs2 if xs2 is not None else ids_b), 3)
        except Exception as e:
            r[key] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
        print(f"{key}: {r[key]}", flush=True)

    # A. full-lane rows: [R, 128] bf16
    t128 = jax.jit(lambda: jax.random.normal(jax.random.key(1), (ROWS, 128), jnp.bfloat16))()
    def f_128(c, ids):
        return c + t128[ids][0, 0].astype(jnp.float32)
    rec("take_width128_ms", f_128, jnp.zeros(()))

    # B. width 32
    t32 = jax.jit(lambda: jax.random.normal(jax.random.key(2), (ROWS, 32), jnp.bfloat16))()
    def f_32(c, ids):
        return c + t32[ids][0, 0].astype(jnp.float32)
    rec("take_width32_ms", f_32, jnp.zeros(()))

    # C. superrow pack: [R/8, 8*32] bf16, gather N/1 rows of 8, then select
    sup = jax.jit(lambda: jax.random.normal(jax.random.key(3), (ROWS // 8, 256), jnp.bfloat16))()
    def f_sup(c, ids):
        g = sup[ids >> 3].reshape(N, 8, 32)
        sel = jax.nn.one_hot(ids & 7, 8, dtype=jnp.bfloat16)  # [N, 8]
        out = jnp.einsum("nkd,nk->nd", g, sel)
        return c + out[0, 0].astype(jnp.float32)
    rec("take_superrow8_ms", f_sup, jnp.zeros(()))

    # D. per-slot batched gather (operand_batching): [26, 100k+pad, 17]
    pv = -(-VOCAB // 8) * 8
    tslot = jax.jit(lambda: jax.random.normal(jax.random.key(4), (SLOTS, pv, D), jnp.bfloat16))()
    def f_slot(c, ids):
        local = (ids.reshape(B, SLOTS) - jnp.arange(SLOTS, dtype=jnp.int32)[None, :] * VOCAB).T  # [26, B]
        out = jnp.take_along_axis(tslot, local[:, :, None], axis=1)
        return c + out[0, 0, 0].astype(jnp.float32)
    rec("take_perslot_batched_ms", f_slot, jnp.zeros(()))

    # E. one_hot matmul gather per slot in XLA (MXU): out = onehot[B, V] @ table
    #    (expected too many FLOPs; measure anyway for reference)
    def f_oh(c, ids):
        local = ids.reshape(B, SLOTS)[:, 0]  # slot 0 only
        oh = jax.nn.one_hot(local, VOCAB, dtype=jnp.bfloat16)
        out = oh @ tslot[0, :VOCAB]
        return c + out[0, 0].astype(jnp.float32)
    rec("onehot_matmul_1slot_ms", f_oh, jnp.zeros(()))

    r.update(rows=ROWS, device=str(jax.devices()[0]))
    print(json.dumps(r))

if __name__ == "__main__":
    main()
