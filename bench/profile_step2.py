#!/usr/bin/env python
"""Composed-step bisection: find where the extra ~15ms comes from when the
full train step is assembled (isolated probes sum to ~4ms). Each probe
carries REAL state through the scan (no constant folding)."""

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


def timed_scan(step_fn, carry0, k=20):
    def loop(c, _):
        return step_fn(c), None

    def make(n):
        @jax.jit
        def run(c):
            c2, _ = jax.lax.scan(loop, c, None, length=n)
            return c2

        return run

    run_k, run_3k = make(k), make(3 * k)

    def fetch(c):
        return float(jax.tree.leaves(c)[0].ravel()[0])

    fetch(run_k(carry0)); fetch(run_3k(carry0))
    t0 = time.time(); fetch(run_k(carry0)); t1 = time.time() - t0
    t0 = time.time(); fetch(run_3k(carry0)); t2 = time.time() - t0
    return max((t2 - t1) / (2 * k), 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    schema = criteo_schema(vocab_size=100_000, embed_dim=16)
    model = build_model("xdeepfm", schema, hidden=(400, 400), cin_sizes=(128, 128))
    eng = Engine(model)
    state0 = eng.init(jax.random.key(0))
    b = next(iter(SyntheticSource(schema, batch_size=args.batch, seed=0)))
    dense, ids, labels = jnp.asarray(b.dense), jnp.asarray(b.ids), jnp.asarray(b.labels)

    def loss_and_grads(state):
        gids = eng._group_ids(ids)
        rows = eng.table_strategy.gather(state.emb_params, gids)

        def loss_fn(dp, rows):
            lg = eng._forward_from_rows(dp, rows, dense)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(lg, labels))

        loss, (gd, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(state.dense_params, rows)
        return gids, loss, gd, gr

    results = {}

    def rec(key, fn, carry):
        if only is not None and key not in only:
            return
        results[key] = round(timed_scan(fn, carry), 3)
        print(f"{key}: {results[key]}", flush=True)

    # (A) gather+fwd+bwd with REAL state carried (perturb tables by loss*0 to
    # keep carry dependency without updates)
    def f_a(st):
        gids, loss, gd, gr = loss_and_grads(st)
        emb = jax.tree.map(lambda t: t + loss * 0.0, st.emb_params)
        return st._replace(emb_params=emb)

    rec("A_gather_fwd_bwd_carry", f_a, state0)

    # (B) A + dense optax update
    def f_b(st):
        gids, loss, gd, gr = loss_and_grads(st)
        up, do = eng.dense_tx.update(gd, st.dense_opt, st.dense_params)
        dp = optax.apply_updates(st.dense_params, up)
        emb = jax.tree.map(lambda t: t + loss * 0.0, st.emb_params)
        return st._replace(dense_params=dp, dense_opt=do, emb_params=emb)

    rec("B_plus_dense_opt", f_b, state0)

    # (C) A + embedding update (no dense opt)
    def f_c(st):
        gids, loss, gd, gr = loss_and_grads(st)
        ep, eo = eng.table_strategy.apply_grads(st.emb_params, st.emb_opt, gids, gr, st.step, 0.01)
        return st._replace(emb_params=ep, emb_opt=eo, step=st.step + 1)

    rec("C_plus_emb_update", f_c, state0)

    # (D) full engine step
    def f_d(st):
        st2, m = eng.train_step(st, dense, ids, labels)
        return st2

    rec("D_full", f_d, state0)

    results.update(batch=args.batch, device=str(jax.devices()[0]))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
