#!/usr/bin/env python
"""Ground-truth per-op profile of the bench train step via jax.profiler +
xplane parse (see .claude/skills/verify: trace the real scan with VARYING
ids — constant ids let XLA hoist the dedup sort and lie about it).

Prints the top-N ops by total device time over one K-step scan, grouped by
a coarse category, plus the category rollup in ms/step.
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
from recmodels_tpu.train.engine import Engine

CATEGORIES = [
    ("update_kernel", re.compile(r"adagrad_kernel|pallas|custom-call", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("gather", re.compile(r"gather", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("conv/dot", re.compile(r"convolution|dot|einsum", re.I)),
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
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/xplane_prof")
    args = ap.parse_args()

    schema = criteo_schema(vocab_size=args.vocab, embed_dim=args.dim)
    # dtype policy mirrors bench.py: bf16 compute everywhere except LR/FM
    # (whose goldens pin f32 math)
    kw = {"hidden": (400, 400), "cin_sizes": (128, 128)} if args.model == "xdeepfm" else {}
    if args.model not in ("lr", "fm"):
        kw["compute_dtype"] = jnp.bfloat16
    model = build_model(args.model, schema, **kw)
    eng = Engine(model)
    state = eng.init(jax.random.key(0))
    scan = eng.jit_train_scan()

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

    # async DMA ops (copy-start / slice-start / *-done) run on the DMA
    # engines and overlap compute — their spans don't add to the critical
    # path; report them separately from the serialized compute stream.
    # Classify by the op's OWN name (text before " = ") — matching the whole
    # HLO line also hits OPERAND names (e.g. a Pallas custom-call consuming
    # a %copy-done), which mislabeled the two biggest kernels as async DMA
    # and manufactured round 3's phantom "6ms serialized-DMA gap".
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
        "batch": args.batch, "k": args.k,
    }))
    for name, ms in per_op.most_common(args.top):
        tag = "ASYNC" if is_async(name) else "sync "
        print(f"{ms / args.k:8.3f} ms/step {tag} [{categorize(name):14s}] {name[:105]}")


if __name__ == "__main__":
    main()
