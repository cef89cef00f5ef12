#!/usr/bin/env python
"""Per-op profile of the SHARDED (1-device mesh) train step — where does the
2.27x sharded-step tax go? (VERDICT r4 missing #1). Same xplane harness as
profile_xplane.py, but the program is build_parallel_scan over make_mesh(1):
capacity-bucketed plan + degenerate all_to_all pair + row-sharded update.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.data import SyntheticSource, criteo_schema
from recmodels_tpu.models import build_model
from recmodels_tpu.parallel import (
    build_parallel_engine, build_parallel_scan, make_mesh, shard_state,
)

CATEGORIES = [
    ("pallas/cc", re.compile(r"adagrad_kernel|pallas|custom-call", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("gather", re.compile(r"gather", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv/dot", re.compile(r"convolution|dot|einsum", re.I)),
    ("all-to-all/coll", re.compile(r"all-to-all|all-reduce|collective", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="xdeepfm")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--capacity", type=float, default=2.0)
    ap.add_argument("--logdir", default="/tmp/xplane_shard")
    args = ap.parse_args()

    schema = criteo_schema(vocab_size=args.vocab, embed_dim=args.dim)
    kw = {"hidden": (400, 400), "cin_sizes": (128, 128)} if args.model == "xdeepfm" else {}
    if args.model not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16
    model = build_model(args.model, schema, **kw)
    mesh = make_mesh(1)
    eng = build_parallel_engine(model, mesh, dense_lr=1e-3, emb_lr=1e-2,
                                capacity_factor=args.capacity)
    state = shard_state(eng.init(jax.random.key(0)), mesh)
    scan = build_parallel_scan(eng, mesh)

    src = iter(SyntheticSource(schema, batch_size=args.batch, seed=1))
    ds, iss, ls = [], [], []
    for _ in range(args.k):
        b = next(src)
        ds.append(b.dense); iss.append(b.ids); ls.append(b.labels)
    sb = (jnp.asarray(np.stack(ds)), jnp.asarray(np.stack(iss)), jnp.asarray(np.stack(ls)))

    state, m = scan(state, *sb)
    float(m["loss"])  # compile + settle

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    state, m = scan(state, *sb)
    float(m["loss"])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

    paths = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane under {args.logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e9  # -> ms

    def is_async(name: str) -> bool:
        op = name.split(" = ")[0]
        return ("copy-start" in op or "slice-start" in op
                or "-done" in op or "async-start" in op)

    sync_total = sum(ms for n, ms in per_op.items()
                     if not is_async(n) and "while" not in n)
    async_total = sum(ms for n, ms in per_op.items() if is_async(n))
    cats = collections.Counter()
    for name, ms in per_op.items():
        if not is_async(name) and "while" not in name:
            cats[categorize(name)] += ms
    print(json.dumps({
        "sync_ms_per_step": round(sync_total / args.k, 3),
        "async_dma_ms_per_step": round(async_total / args.k, 3),
        "sync_categories_ms_per_step": {c: round(v / args.k, 3) for c, v in cats.most_common()},
        "batch": args.batch, "k": args.k, "capacity": args.capacity,
    }))
    for name, ms in per_op.most_common(args.top):
        tag = "ASYNC" if is_async(name) else "sync "
        print(f"{ms / args.k:8.3f} ms/step {tag} [{categorize(name):14s}] {name[:105]}")


if __name__ == "__main__":
    main()
