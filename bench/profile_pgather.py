#!/usr/bin/env python
"""Measure the Pallas sweep-gather kernel + packed update at flagship shape."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from recmodels_tpu.embedding import pallas_gather, pallas_update

B, SLOTS, VOCAB, D = 8192, 26, 100_000, 17
ROWS = -(-SLOTS * VOCAB // 1024) * 1024
N = B * SLOTS
K = 8

def timed(step_fn, consts, xs_small, xs_big, k=K):
    @jax.jit
    def run(consts, c, xs):
        def loop(c, x):
            return c + step_fn(consts, x), None
        c2, _ = jax.lax.scan(loop, c, xs)
        return c2
    c0 = jnp.zeros(())
    def fetch(xs): return float(run(consts, c0, xs))
    fetch(xs_small); fetch(xs_big)
    t1 = min((lambda t0: (fetch(xs_small), time.time()-t0)[1])(time.time()) for _ in range(3))
    t2 = min((lambda t0: (fetch(xs_big), time.time()-t0)[1])(time.time()) for _ in range(3))
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3

def main():
    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument("--only", default=None)
    only = set(ap.parse_args().only.split(",")) if ap.parse_args().only else None
    rng = np.random.default_rng(0)

    def make_ids(k, sort):
        ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
        off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
        flat = (ids + off).reshape(k, N)
        return jnp.asarray(np.sort(flat, axis=1) if sort else flat)

    sids_s, sids_b = make_ids(K, True), make_ids(3 * K, True)
    ids_s, ids_b = make_ids(K, False), make_ids(3 * K, False)
    table = jax.jit(lambda k: jax.random.normal(k, (ROWS, D), jnp.float32))(jax.random.key(1))
    packed = jax.jit(pallas_gather.pack)(table)

    r = {}
    def rec(key, fn, consts, xs1, xs2):
        if only is not None and key not in only:
            return
        try:
            r[key] = round(timed(fn, consts, xs1, xs2), 3)
        except Exception as e:
            r[key] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"{key}: {r[key]}", flush=True)

    # 1. sweep kernel alone (pre-sorted ids)
    rec("sweep_kernel_ms",
        lambda t, ids: pallas_gather.sorted_gather(t, ids)[0, 0].astype(jnp.float32),
        packed, sids_s, sids_b)

    # 2. full gather path: sort + sweep + inverse-permutation take
    def full_path(t, ids):
        iota = jnp.arange(N, dtype=jnp.int32)
        s, order = jax.lax.sort_key_val(ids, iota)
        rows_sorted = pallas_gather.sorted_gather(t, s)
        inv = jax.lax.sort_key_val(order, iota)[1]
        rows = jnp.take(rows_sorted, inv, axis=0)
        return rows[0, 0].astype(jnp.float32)
    rec("gather_path_ms", full_path, packed, ids_s, ids_b)

    # 3. packed update kernel (sorted raw ids + bf16 grads, flagship dtype)
    g_s = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(jax.random.key(2))
    acc_p = jax.jit(pallas_gather.pack)(jnp.full((ROWS, D), 0.1, jnp.float32))

    def upd_packed(consts, ids):
        t, a = consts
        t2, a2 = pallas_update.sorted_adagrad_update_packed(t, a, ids, g_s, 0.01, 1e-8)
        return t2[0, 0, 0] * 0 + a2[0, 0, 0] * 0
    rec("update_packed_ms", upd_packed, (packed, acc_p), sids_s, sids_b)

    # 4. old 2-D update kernel for comparison
    acc2 = jnp.full((ROWS, D), 0.1, jnp.float32)
    def upd_2d(consts, ids):
        t, a = consts
        t2, a2 = pallas_update.sorted_adagrad_update(t, a, ids, g_s, 0.01, 1e-8)
        return t2[0, 0] * 0 + a2[0, 0] * 0
    rec("update_2d_ms", upd_2d, (table, acc2), sids_s, sids_b)

    # correctness on-chip: sweep vs XLA take
    if only is None or "check" in only:
        out = jax.jit(pallas_gather.sorted_gather)(packed, sids_s[0])
        ref = table[sids_s[0]].astype(jnp.bfloat16)
        r["exact_match"] = bool(jnp.array_equal(out, ref))
        print("exact_match:", r["exact_match"], flush=True)
    print(json.dumps(r), flush=True)

if __name__ == "__main__":
    main()
