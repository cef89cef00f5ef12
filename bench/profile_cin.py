#!/usr/bin/env python
"""Isolated timings of the CIN forward/backward pieces at flagship shapes
(b=16384, D=16 -> R=262144; L1: hk=m=26, L2: hk=128; hn=128 both)."""

from __future__ import annotations

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.ops.pallas import interactions_tpu as K

R = 262144
M = 26
HN = 128


def timeit(label, fn, *args):
    """Anchored timing: block_until_ready is not trustworthy on axon, so
    chain k dependent reps inside ONE jitted scan and anchor on a scalar
    fetch; (t_k - t_1)/(k-1) cancels dispatch+fetch overhead."""

    def chained(k):
        def run(*a):
            o = fn(*a)
            acc = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(o))
            for _ in range(k - 1):
                # perturb an input by a data-dependent epsilon so XLA can't CSE
                a = (a[0] + (acc * 1e-30).astype(a[0].dtype),) + a[1:]
                o = fn(*a)
                acc = acc + sum(
                    jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(o)
                )
            return acc
        return jax.jit(run)

    k = 16
    f1, fk = chained(1), chained(k)
    float(f1(*args)); float(fk(*args))  # compile

    def run(f):
        t0 = time.time()
        float(f(*args))
        return time.time() - t0

    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    dt = (tk - t1) / (k - 1)
    print(f"{label:42s} {1000*dt:7.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    for hk, name in ((26, "L1"), (128, "L2")):
        xk = jnp.asarray(rng.standard_normal((R, hk)), jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((R, M)), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((hk, M * HN)), jnp.float32).astype(jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((R, HN)), jnp.bfloat16)
        timeit(f"{name} fwd pallas", K._cin_forward_2d, xk, x0, w2)
        timeit(f"{name} bwd einsum", lambda xk, x0, w2, g: K._cin_2d_bwd((xk, x0, w2), g), xk, x0, w2, g)
        if hk % 128 == 0:
            timeit(f"{name} bwd pallas", K._cin_bwd_pallas, xk, x0, w2, g)
        # fwd einsum reference for comparison
        def fwd_ref(xk, x0, w2):
            w3 = w2.reshape(hk, M, HN)
            t = jnp.einsum("rh,hin->rin", xk, w3, preferred_element_type=jnp.float32)
            return jnp.einsum("rin,ri->rn", t, x0.astype(t.dtype)).astype(xk.dtype)
        timeit(f"{name} fwd einsum", fwd_ref, xk, x0, w2)


if __name__ == "__main__":
    main()
