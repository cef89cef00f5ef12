#!/usr/bin/env python
"""Probe Mosaic in-kernel lane gather (jnp.take axis=1) for the sweep-gather
inner op: correctness + speed at visit scale."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

r = {}
rng = np.random.default_rng(0)

def report(k, v):
    r[k] = v
    print(f"{k}: {v}", flush=True)

# A. correctness: one block, take along lanes extent 512
d8, tr, tp = 24, 512, 512
x = jnp.asarray(rng.normal(size=(d8, tr)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, tr, size=(1, tp)).astype(np.int32))

def kern_take(x_ref, i_ref, o_ref):
    ii = jnp.broadcast_to(i_ref[:], (x_ref.shape[0], i_ref.shape[1]))
    o_ref[:] = jnp.take_along_axis(x_ref[:], ii, axis=1)

try:
    out = pl.pallas_call(
        kern_take,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d8, tp), jnp.float32),
    )(x, idx)
    ok = bool(jnp.array_equal(out, x[:, idx[0]]))
    report("take_lane_512_correct", ok)
except Exception as e:
    report("take_lane_512_correct", f"FAIL: {type(e).__name__}: {str(e)[:200]}")

# A2. take + transposed store [tp, d8]
def kern_take_t(x_ref, i_ref, o_ref):
    ii = jnp.broadcast_to(i_ref[:], (x_ref.shape[0], i_ref.shape[1]))
    o_ref[:] = jnp.swapaxes(jnp.take_along_axis(x_ref[:], ii, axis=1), 0, 1)

try:
    out = pl.pallas_call(
        kern_take_t,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, d8), jnp.float32),
    )(x, idx)
    ok = bool(jnp.array_equal(out, x[:, idx[0]].T))
    report("take_lane_T_correct", ok)
except Exception as e:
    report("take_lane_T_correct", f"FAIL: {type(e).__name__}: {str(e)[:200]}")

# B. speed at visit scale: grid of V visits, each takes from its own tile
V = 4096
xs = jnp.asarray(rng.normal(size=(V, d8, tr)).astype(np.float32))
def timed(fn, xs_small, xs_big, k):
    @jax.jit
    def run(c, xs):
        def loop(c, i):
            return c + fn(i)[0, 0, 0], None
        c2, _ = jax.lax.scan(loop, c, xs)
        return c2
    def fetch(xs): return float(run(jnp.zeros(()), xs))
    fetch(xs_small); fetch(xs_big)
    t1 = min((lambda t0: (fetch(xs_small), time.time()-t0)[1])(time.time()) for _ in range(3))
    t2 = min((lambda t0: (fetch(xs_big), time.time()-t0)[1])(time.time()) for _ in range(3))
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3

K = 2
idxs_s = jnp.asarray(rng.integers(0, tr, size=(K, V, tp)).astype(np.int32))
idxs_b = jnp.asarray(rng.integers(0, tr, size=(3 * K, V, tp)).astype(np.int32))

def kern_many(x_ref, i_ref, o_ref):
    x = x_ref[0]
    ii = jnp.broadcast_to(i_ref[:], (x.shape[0], i_ref.shape[1]))
    o_ref[:] = jnp.swapaxes(jnp.take_along_axis(x, ii, axis=1), 0, 1)[None]

def call_many(idx_all):
    return pl.pallas_call(
        kern_many,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, d8, tr), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, d8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, tp, d8), jnp.float32),
    )(xs, idx_all)

try:
    ms = timed(call_many, idxs_s, idxs_b, K)
    report("take_lane_4096visits_ms", round(ms, 3))
except Exception as e:
    report("take_lane_4096visits_ms", f"FAIL: {type(e).__name__}: {str(e)[:200]}")

print(json.dumps(r), flush=True)
