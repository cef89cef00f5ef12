#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line (driver contract).

Metric of record (BASELINE.json:2): Criteo examples/sec/chip at xDeepFM
(CIN(128,128) + DNN(400,400), 26 slots, 1e5 hashed vocab, dim 16), training
step (fwd+bwd+optimizers), single chip. Data is the synthetic Criteo-shaped
stream (the real dataset is not present in this zero-egress image; shapes,
dtypes and id distributions match the frozen spec).

``--model``/``--batch``/... override; ``--all`` prints a line per model.
``vs_baseline`` is measured/golden where a golden exists in
bench/goldens.json, else 1.0 (the reference publishes no numbers —
BASELINE.json:13).
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "bench", "goldens.json")

MODEL_KW = {
    "lr": {},
    "fm": {},
    "deepfm": {"hidden": (400, 400, 400)},
    "pnn": {"hidden": (400, 400), "mode": "both"},
    "dcn": {"hidden": (512, 256), "n_cross": 3},
    "xdeepfm": {"hidden": (400, 400), "cin_sizes": (128, 128)},
    "widedeep": {"hidden": (256, 128)},
    "nfm": {"hidden": (128, 128)},
    "afm": {"attention_dim": 32},
}


def bench_model(name: str, batch: int, steps: int, warmup: int, vocab: int, dim: int,
                bf16: bool) -> dict:
    """Times a lax.scan of ``steps`` train steps as ONE device program
    (dispatch-free), via two anchored runs so constant dispatch+fetch
    overhead cancels. block_until_ready is not trustworthy on the
    experimental axon platform, so timing is anchored on value fetches."""
    from recmodels_tpu.data import SyntheticSource, criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=vocab, embed_dim=dim)
    kw = dict(MODEL_KW[name])
    if bf16 and name not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16
    model = build_model(name, schema, **kw)
    engine = Engine(model, dense_lr=1e-3, emb_lr=1e-2)
    state = engine.init(jax.random.key(0))
    scan = engine.jit_train_scan()

    def superbatch(k, seed):
        src = SyntheticSource(schema, batch_size=batch, seed=seed)
        it = iter(src)
        ds, iss, ls = [], [], []
        for _ in range(k):
            b = next(it)
            ds.append(b.dense)
            iss.append(b.ids)
            ls.append(b.labels)
        import numpy as np

        return (
            jnp.asarray(np.stack(ds)),
            jnp.asarray(np.stack(iss)),
            jnp.asarray(np.stack(ls)),
        )

    small = superbatch(1, seed=0)
    big = superbatch(steps, seed=1)

    t_compile = time.time()
    state, m = scan(state, *small)
    float(m["loss"])
    compile_s = time.time() - t_compile
    # big superbatch triggers a second compile (different K)
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
    dt = max((t2 - t1) / (steps - 1), 1e-9)
    eps = batch / dt
    return {
        "model": name,
        "examples_per_sec": eps,
        "step_ms": 1000.0 * dt,
        "batch": batch,
        "compile_plus_warmup_s": round(compile_s, 2),
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="xdeepfm", choices=sorted(MODEL_KW))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--no-bf16", action="store_true")
    args = ap.parse_args()

    goldens = {}
    if os.path.exists(GOLDENS_PATH):
        with open(GOLDENS_PATH) as f:
            goldens = json.load(f)

    names = sorted(MODEL_KW) if args.all else [args.model]
    for name in names:
        r = bench_model(
            name, args.batch, args.steps, args.warmup, args.vocab, args.dim,
            bf16=not args.no_bf16,
        )
        golden = goldens.get(name, {}).get("examples_per_sec")
        vs = r["examples_per_sec"] / golden if golden else 1.0
        line = {
            "metric": f"{name}_train_examples_per_sec_per_chip",
            "value": round(r["examples_per_sec"], 1),
            "unit": "examples/s",
            "vs_baseline": round(vs, 3),
            **{k: r[k] for k in ("step_ms", "batch", "compile_plus_warmup_s", "device")},
        }
        print(json.dumps(line))


if __name__ == "__main__":
    main()
