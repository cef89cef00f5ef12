#!/usr/bin/env python
"""Measure the Pallas sweep-gather kernel vs XLA take at the flagship shape."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from recmodels_tpu.embedding import pallas_gather

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

rng = np.random.default_rng(0)
def make_sorted_ids(k):
    ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
    off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
    return jnp.asarray(np.sort((ids + off).reshape(k, N), axis=1))

ids_s, ids_b = make_sorted_ids(K), make_sorted_ids(3 * K)
table = jax.jit(lambda k: jax.random.normal(k, (ROWS, D), jnp.float32))(jax.random.key(1))

r = {}
def f_sweep(t, ids):
    return pallas_gather.sorted_gather(t, ids)[0, 0].astype(jnp.float32)
r["pallas_sweep_gather_ms"] = round(timed(f_sweep, table, ids_s, ids_b), 3)
print("pallas_sweep_gather_ms:", r["pallas_sweep_gather_ms"], flush=True)

# sanity check vs XLA on one batch
out = jax.jit(pallas_gather.sorted_gather)(table, ids_s[0])
ref = table[ids_s[0]].astype(jnp.bfloat16)
ok = bool(jnp.array_equal(out, ref))
r["exact_match"] = ok
print("exact_match:", ok, flush=True)
print(json.dumps(r), flush=True)
