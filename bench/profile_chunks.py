#!/usr/bin/env python
"""Sweep tp (gather chunk) / tc (update chunk) for the Pallas kernels."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from recmodels_tpu.embedding import pallas_gather, pallas_update

B, SLOTS, VOCAB, D = 8192, 26, 100_000, 17
ROWS = -(-SLOTS*VOCAB//1024)*1024
N = B*SLOTS
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
def make_sorted(k):
    ids = rng.integers(0, VOCAB, size=(k, B, SLOTS)).astype(np.int32)
    off = (np.arange(SLOTS, dtype=np.int32) * VOCAB)[None, None, :]
    return jnp.asarray(np.sort((ids + off).reshape(k, N), axis=1))
sids_s, sids_b = make_sorted(K), make_sorted(3*K)
table = jax.jit(lambda k: jax.random.normal(k, (ROWS, D), jnp.float32))(jax.random.key(1))
packed = jax.jit(pallas_gather.pack)(table)
g_bf16 = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(jax.random.key(2))
acc_p = jax.jit(pallas_gather.pack)(jnp.full((ROWS, D), 0.1, jnp.float32))

r = {}
which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
for tp in (128, 256, 512):
    key = f"sweep_tp{tp}_ms"
    if which and key not in which: continue
    try:
        r[key] = round(timed(lambda t, ids: pallas_gather.sorted_gather(t, ids, tp=tp)[0,0].astype(jnp.float32),
                             packed, sids_s, sids_b), 3)
    except Exception as e:
        r[key] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(key, r[key], flush=True)

for tc in (512, 128):
    key = f"update_tc{tc}_ms"
    if which and key not in which: continue
    def upd(consts, ids, tc=tc):
        t, a = consts
        t2, a2 = pallas_update.sorted_adagrad_update_packed(t, a, ids, g_bf16, 0.01, 1e-8, tc=tc)
        return t2[0,0,0]*0 + a2[0,0,0]*0
    try:
        r[key] = round(timed(upd, (packed, acc_p), sids_s, sids_b), 3)
    except Exception as e:
        r[key] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    print(key, r[key], flush=True)

# correctness of the tuned variants (fresh buffers, no aliasing pollution)
ids0 = np.asarray(sids_s[0])
out = jax.jit(lambda p, i: pallas_gather.sorted_gather(p, i, tp=128))(packed, jnp.asarray(ids0))[:, :D]
r["sweep_tp128_exact"] = bool(jnp.array_equal(out, table[jnp.asarray(ids0)].astype(jnp.bfloat16)))
print("sweep_tp128_exact", r["sweep_tp128_exact"], flush=True)
print(json.dumps(r), flush=True)
