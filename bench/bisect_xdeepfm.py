#!/usr/bin/env python
"""Bisect the flagship xDeepFM step: time config ablations to attribute
step-ms between the embedding engine, the CIN stack, and the MLP."""

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

from recmodels_tpu.data import SyntheticSource, criteo_schema
from recmodels_tpu.models import build_model
from recmodels_tpu.train.engine import Engine

BATCH = int(os.environ.get("BB", "16384"))
STEPS = 20


def superbatch(schema, k, seed):
    src = SyntheticSource(schema, batch_size=BATCH, seed=seed)
    it = iter(src)
    ds, iss, ls = [], [], []
    for _ in range(k):
        b = next(it)
        ds.append(b.dense)
        iss.append(b.ids)
        ls.append(b.labels)
    return (jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(iss)),
            jnp.asarray(np.stack(ls)))


def time_cfg(label, **kw):
    schema = criteo_schema(vocab_size=100_000, embed_dim=16)
    kw.setdefault("hidden", (400, 400))
    kw.setdefault("cin_sizes", (128, 128))
    kw["compute_dtype"] = jnp.bfloat16
    model = build_model("xdeepfm", schema, **kw)
    engine = Engine(model, dense_lr=1e-3, emb_lr=1e-2)
    state = engine.init(jax.random.key(0))
    scan = engine.jit_train_scan()
    small = superbatch(schema, 1, 0)
    big = superbatch(schema, STEPS, 1)
    state, m = scan(state, *small)
    float(m["loss"])
    state, m = scan(state, *big)
    float(m["loss"])

    def run(sb):
        nonlocal state
        t0 = time.time()
        state, m = scan(state, *sb)
        float(m["loss"])
        return time.time() - t0

    t1 = min(run(small) for _ in range(3))
    t2 = min(run(big) for _ in range(3))
    dt = (t2 - t1) / (STEPS - 1)
    print(f"{label:34s} {1000*dt:7.2f} ms/step  {BATCH/dt:12,.0f} ex/s")
    return dt


if __name__ == "__main__":
    time_cfg("flagship cin(128,128)+mlp(400,400)")
    time_cfg("cin(128,) only", cin_sizes=(128,))
    time_cfg("cin(128,128,128)", cin_sizes=(128, 128, 128))
    time_cfg("cin(128,128), tiny mlp", hidden=(8,))
