#!/usr/bin/env python
"""Step-time breakdown: times each stage of the train step as a K-fold scan
(dispatch-free), isolating gather / forward / backward / sparse-update /
all-in. Run on TPU to find the bottleneck (kernel-level truth needs
jax.profiler; this gives the architecture-level split)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recmodels_tpu.data import SyntheticSource, criteo_schema
from recmodels_tpu.models import build_model
from recmodels_tpu.train.engine import Engine


def timed_scan(fn, carry, k: int):
    """Time fn scanned k and 3k times; return per-iter seconds (slope)."""

    def loop(c, _):
        return fn(c), None

    @jax.jit
    def run_k(c):
        c, _ = jax.lax.scan(loop, c, None, length=k)
        return c

    @jax.jit
    def run_3k(c):
        c, _ = jax.lax.scan(loop, c, None, length=3 * k)
        return c

    def fetch(c):
        return float(jax.tree.leaves(c)[0].ravel()[0])

    fetch(run_k(carry))  # compile
    fetch(run_3k(carry))
    t0 = time.time(); fetch(run_k(carry)); t1 = time.time() - t0
    t0 = time.time(); fetch(run_3k(carry)); t2 = time.time() - t0
    return max((t2 - t1) / (2 * k), 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="xdeepfm")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    schema = criteo_schema(vocab_size=args.vocab, embed_dim=args.dim)
    kw = {}
    if args.model == "xdeepfm":
        kw = {"hidden": (400, 400), "cin_sizes": (128, 128)}
        if args.bf16:
            kw["compute_dtype"] = jnp.bfloat16
    model = build_model(args.model, schema, **kw)
    eng = Engine(model)
    state = eng.init(jax.random.key(0))
    b = next(iter(SyntheticSource(schema, batch_size=args.batch, seed=0)))
    dense, ids, labels = jnp.asarray(b.dense), jnp.asarray(b.ids), jnp.asarray(b.labels)

    gids = eng._group_ids(ids)
    rows0 = eng.table_strategy.gather(state.emb_params, gids)

    results = {}

    # (a) gather only
    def f_gather(c):
        r = eng.table_strategy.gather(state.emb_params, gids)
        s = sum(jnp.sum(v) for g in r.values() for v in g.values())
        return c + s

    results["gather_ms"] = timed_scan(f_gather, jnp.zeros(()), args.k) * 1e3

    # (b) forward only (from pre-gathered rows)
    def f_fwd(c):
        logits = eng._forward_from_rows(state.dense_params, rows0, dense)
        return c + jnp.sum(logits)

    results["forward_ms"] = timed_scan(f_fwd, jnp.zeros(()), args.k) * 1e3

    # (c) forward+backward (no updates)
    def f_fwdbwd(c):
        def loss_fn(dp, rows):
            lg = eng._forward_from_rows(dp, rows, dense)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(lg, labels))

        loss, (gd, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.dense_params, rows0)
        s = loss + sum(jnp.sum(v) for g in gr.values() for v in g.values())
        return c + s

    results["fwd_bwd_ms"] = timed_scan(f_fwdbwd, jnp.zeros(()), args.k) * 1e3

    # (d) sparse update only (fixed grads)
    grows = jax.tree.map(jnp.ones_like, rows0)

    def f_sparse(c_state):
        st, c = c_state
        ep, eo = eng.table_strategy.apply_grads(
            st.emb_params, st.emb_opt, gids, grows, st.step, 0.01
        )
        return (st._replace(emb_params=ep, emb_opt=eo), c + ep[next(iter(ep))][
            next(iter(ep[next(iter(ep))]))][0, 0])

    results["sparse_update_ms"] = timed_scan(f_sparse, (state, jnp.zeros(())), args.k) * 1e3

    # (e) full step
    def f_full(c_state):
        st, c = c_state
        st, m = eng.train_step(st, dense, ids, labels)
        return (st, c + m["loss"])

    results["full_step_ms"] = timed_scan(f_full, (state, jnp.zeros(())), args.k) * 1e3

    results = {k: round(v, 3) for k, v in results.items()}
    results.update(model=args.model, batch=args.batch, device=str(jax.devices()[0]))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
