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
if os.environ.get("RECMODELS_BENCH_CPU"):
    # scaling-mode re-exec onto fake CPU devices: this environment's
    # sitecustomize re-sets jax_platforms at import, so fix it post-import
    jax.config.update("jax_platforms", "cpu")

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

# Per-model throughput-optimal batch (BASELINE.md round-3 sweep): the two
# embedding-kernel full-table sweeps are fixed-cost per step, so larger
# batches win until sort/HBM pressure catches up — every model gains 3-34%
# at 16384 except f32 FM (3-part-split traffic scales with ids; -17%).
DEFAULT_BATCH = {"fm": 8192}
DEFAULT_BATCH_OTHER = 16384


def bench_model(name: str, batch: int, steps: int, warmup: int, vocab: int, dim: int,
                bf16: bool, sparse_opt: str = "adagrad") -> dict:
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
    engine = Engine(model, dense_lr=1e-3, emb_lr=1e-2, sparse_optimizer=sparse_opt)
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


def bench_sharded_tax(name: str, batch: int, steps: int, vocab: int,
                      dim: int, bf16: bool, capacity: float = 2.0) -> dict:
    """The sharded-step tax on ONE device (VERDICT r3 item 3): the full
    shard_map program (capacity-bucketed plan, all_to_all pair — degenerate
    at n=1 — row-sharded update, psum'd dense grads) on a 1-device mesh vs
    the LocalTables step at the SAME batch. The ratio bounds real
    multi-chip efficiency from above: N chips can at best deliver
    N x local x (1/tax) examples/s before any ICI time."""
    import numpy as np

    from recmodels_tpu.data import SyntheticSource, criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.parallel import (
        build_parallel_engine, build_parallel_scan, make_mesh, shard_state,
    )
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=vocab, embed_dim=dim)
    kw = dict(MODEL_KW[name])
    if bf16 and name not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16

    def eps_of(scan, state):
        src = iter(SyntheticSource(schema, batch_size=batch, seed=1))
        ds, iss, ls = zip(*((b.dense, b.ids, b.labels)
                            for b, _ in zip(src, range(steps))))
        xs = (jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(iss)),
              jnp.asarray(np.stack(ls)))
        small = tuple(x[:1] for x in xs)
        state, m = scan(state, *small)
        float(m["loss"])
        state, m = scan(state, *xs)
        float(m["loss"])

        def run(sb):
            nonlocal state
            t0 = time.time()
            state, m = scan(state, *sb)
            float(m["loss"])
            return time.time() - t0

        t1 = min(run(small) for _ in range(3))
        t2 = min(run(xs) for _ in range(3))
        return batch / max((t2 - t1) / (steps - 1), 1e-9)

    model = build_model(name, schema, **kw)
    eng_l = Engine(model, dense_lr=1e-3, emb_lr=1e-2)
    eps_local = eps_of(eng_l.jit_train_scan(), eng_l.init(jax.random.key(0)))

    mesh = make_mesh(1)
    model2 = build_model(name, schema, **kw)
    eng_s = build_parallel_engine(model2, mesh, dense_lr=1e-3, emb_lr=1e-2,
                                  capacity_factor=capacity)
    state_s = shard_state(eng_s.init(jax.random.key(0)), mesh)
    eps_shard = eps_of(build_parallel_scan(eng_s, mesh), state_s)
    return {
        "model": name,
        "examples_per_sec_local": round(eps_local, 1),
        "examples_per_sec_sharded_1dev": round(eps_shard, 1),
        "sharded_step_tax": round(eps_local / max(eps_shard, 1e-9), 4),
        "capacity_factor": capacity,
        "batch": batch,
        "device": str(jax.devices()[0]),
    }


def bench_infer(name: str, batch: int, steps: int, vocab: int, dim: int,
                bf16: bool) -> dict:
    """Forward-only (serving) throughput: a lax.scan of ``steps`` logits
    batches as one device program, same anchored two-run timing as
    bench_model."""
    import numpy as np

    from recmodels_tpu.data import SyntheticSource, criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=vocab, embed_dim=dim)
    kw = dict(MODEL_KW[name])
    if bf16 and name not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16
    model = build_model(name, schema, **kw)
    engine = Engine(model)
    state = engine.init(jax.random.key(0))

    @jax.jit
    def infer_scan(state, dense, ids):
        def body(carry, batch):
            d, i = batch
            return carry, engine.logits(state, d, i)

        _, logits = jax.lax.scan(body, 0, (dense, ids))
        # anchor on a scalar so timing fetches one value, not [K, B] logits
        return jnp.sum(logits[-1])

    def superbatch(k, seed):
        src = iter(SyntheticSource(schema, batch_size=batch, seed=seed))
        ds, iss = zip(*((b.dense, b.ids) for b, _ in zip(src, range(k))))
        return jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(iss))

    small = superbatch(1, seed=0)
    big = superbatch(steps, seed=1)
    t0 = time.time()
    float(infer_scan(state, *small))
    compile_s = time.time() - t0
    float(infer_scan(state, *big))

    def run(sb):
        t0 = time.time()
        float(infer_scan(state, *sb))
        return time.time() - t0

    t1 = min(run(small) for _ in range(3))
    t2 = min(run(big) for _ in range(3))
    dt = max((t2 - t1) / (steps - 1), 1e-9)
    return {
        "model": name,
        "examples_per_sec": batch / dt,
        "step_ms": 1000.0 * dt,
        "batch": batch,
        "compile_plus_warmup_s": round(compile_s, 2),
        "device": str(jax.devices()[0]),
    }


def bench_scaling(name: str, devices: int, batch_per_device: int, steps: int,
                  vocab: int, dim: int, bf16: bool) -> dict:
    """Scaling-efficiency harness (BASELINE.json:5 '>=80% examples/s scaling
    efficiency'): times the sharded train_scan (row-sharded tables +
    all_to_all + psum under shard_map) on an n-device mesh vs the same code
    on a 1-device mesh, with CONSTANT per-device batch (weak scaling).
    On this 1-chip environment it runs on fake CPU devices — a correctness/
    plumbing smoke whose JSON shape is ready for real multi-chip hardware
    (CPU numbers are not perf)."""
    import numpy as np

    from recmodels_tpu.data import SyntheticSource, criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.parallel import (
        build_parallel_engine,
        build_parallel_scan,
        make_mesh,
        shard_state,
    )

    schema = criteo_schema(vocab_size=vocab, embed_dim=dim)
    kw = dict(MODEL_KW[name])
    if bf16 and name not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16

    def run_mesh(n_dev: int) -> float:
        mesh = make_mesh(n_dev)
        model = build_model(name, schema, **kw)
        engine = build_parallel_engine(model, mesh)
        state = shard_state(engine.init(jax.random.key(0)), mesh)
        scan = build_parallel_scan(engine, mesh)
        gbatch = batch_per_device * n_dev
        src = SyntheticSource(schema, batch_size=gbatch, seed=1)
        it = iter(src)
        ds, iss, ls = zip(*((b.dense, b.ids, b.labels) for b, _ in zip(it, range(steps))))
        xs = (jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(iss)), jnp.asarray(np.stack(ls)))
        small = tuple(x[:1] for x in xs)
        state, m = scan(state, *small)
        float(m["loss"])
        state, m = scan(state, *xs)
        float(m["loss"])

        def run(sb):
            nonlocal state
            t0 = time.time()
            state, m = scan(state, *sb)
            float(m["loss"])
            return time.time() - t0

        t1 = min(run(small) for _ in range(3))
        t2 = min(run(xs) for _ in range(3))
        dt = max((t2 - t1) / (steps - 1), 1e-9)
        return gbatch / dt

    eps1 = run_mesh(1)
    epsn = run_mesh(devices)
    eff = (epsn / devices) / eps1
    return {
        "model": name,
        "devices": devices,
        "examples_per_sec_1dev": round(eps1, 1),
        "examples_per_sec_ndev": round(epsn, 1),
        "scaling_efficiency": round(eff, 4),
        "batch_per_device": batch_per_device,
        "platform": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="xdeepfm", choices=sorted(MODEL_KW))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = per-model throughput-optimal default "
                         "(DEFAULT_BATCH table)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--no-bf16", action="store_true")
    ap.add_argument("--sparse-opt", default="adagrad",
                    choices=["adagrad", "adam", "adam_dense"],
                    help="embedding-table optimizer (BASELINE.json:5 "
                         "'Adam/Adagrad'); adam rides the packed lazy-Adam "
                         "sweep kernel")
    ap.add_argument("--infer", action="store_true",
                    help="forward-only (serving) throughput instead of train")
    ap.add_argument("--devices", type=int, default=0,
                    help="scaling mode: weak-scaling efficiency on an N-device "
                         "mesh (re-execs onto N fake CPU devices if fewer are attached)")
    ap.add_argument("--batch-per-device", type=int, default=4096)
    ap.add_argument("--capacity", type=float, default=2.0,
                    help="sharded-tax mode: table-shard bucket capacity "
                         "factor (scales every all_to_all buffer linearly)")
    ap.add_argument("--sharded-tax", action="store_true",
                    help="measure the 1-device shard_map program vs "
                         "LocalTables at the same batch (multi-chip "
                         "efficiency upper bound)")
    args = ap.parse_args()

    if args.sharded_tax:
        batch = args.batch or DEFAULT_BATCH.get(args.model, DEFAULT_BATCH_OTHER)
        r = bench_sharded_tax(args.model, batch, max(args.steps, 8),
                              args.vocab, args.dim, bf16=not args.no_bf16,
                              capacity=args.capacity)
        print(json.dumps({
            "metric": f"{args.model}_sharded_step_tax",
            "value": r["sharded_step_tax"],
            "unit": "x_local_step_time",
            "vs_baseline": 1.0,
            **r,
        }))
        return

    if args.devices:
        if len(jax.devices()) < args.devices and not os.environ.get("RECMODELS_BENCH_CPU"):
            # not enough real devices: re-exec onto a fake CPU mesh
            import sys

            env = dict(os.environ)
            flags = env.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={args.devices}"
                ).strip()
            env["RECMODELS_BENCH_CPU"] = "1"
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        r = bench_scaling(
            args.model, args.devices, args.batch_per_device, max(args.steps, 8),
            args.vocab, args.dim, bf16=not args.no_bf16,
        )
        print(json.dumps({
            "metric": f"{args.model}_scaling_efficiency_{args.devices}dev",
            "value": r["scaling_efficiency"],
            "unit": "fraction",
            "vs_baseline": round(r["scaling_efficiency"] / 0.8, 3),  # target >=0.8
            # CPU fake-device meshes validate the program, not performance:
            # N devices contend for 2 host cores, so the efficiency number
            # is core-contention noise (VERDICT r4 weak #4). Downstream
            # consumers must skip plumbing_only rows when judging perf.
            "plumbing_only": jax.default_backend() == "cpu",
            **r,
        }))
        return

    goldens = {}
    if os.path.exists(GOLDENS_PATH):
        with open(GOLDENS_PATH) as f:
            goldens = json.load(f)

    names = sorted(MODEL_KW) if args.all else [args.model]
    for name in names:
        batch = args.batch or DEFAULT_BATCH.get(name, DEFAULT_BATCH_OTHER)
        if args.infer:
            r = bench_infer(name, batch, args.steps, args.vocab,
                            args.dim, bf16=not args.no_bf16)
            golden = goldens.get(f"{name}_infer", {}).get("examples_per_sec")
        else:
            r = bench_model(
                name, batch, args.steps, args.warmup, args.vocab, args.dim,
                bf16=not args.no_bf16, sparse_opt=args.sparse_opt,
            )
            key = name if args.sparse_opt == "adagrad" else f"{name}_{args.sparse_opt}"
            golden = goldens.get(key, {}).get("examples_per_sec")
        vs = r["examples_per_sec"] / golden if golden else 1.0
        mode = "infer" if args.infer else "train"
        opt_tag = "" if (args.infer or args.sparse_opt == "adagrad") else f"_{args.sparse_opt}"
        line = {
            "metric": f"{name}{opt_tag}_{mode}_examples_per_sec_per_chip",
            "value": round(r["examples_per_sec"], 1),
            "unit": "examples/s",
            "vs_baseline": round(vs, 3),
            **{k: r[k] for k in ("step_ms", "batch", "compile_plus_warmup_s", "device")},
        }
        print(json.dumps(line))


if __name__ == "__main__":
    main()
