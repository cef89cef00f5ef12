"""The outer training loop: data feed, logging, eval, checkpoint, resume.

Parity with the reference's ``Optimizer.optimize()`` driver loop + Trigger
system (SURVEY.md §2a #11, #14, #15): periodic validation (streaming AUC /
logloss), periodic checkpoints (model + BOTH optimizer states + data
cursor), TensorBoard scalars, throughput accounting. Host-side Python does
no math — every step is the jit'd engine step.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from recmodels_tpu.data import CriteoTSVSource, SyntheticSource, criteo_schema
from recmodels_tpu.data.schema import Schema
from recmodels_tpu.models import build_model
from recmodels_tpu.train import metrics as metrics_lib
from recmodels_tpu.train.checkpoint import CheckpointManager
from recmodels_tpu.train.engine import Engine
from recmodels_tpu.utils.config import TrainConfig
from recmodels_tpu.utils.logging import MetricsLogger


def build_schema(cfg: TrainConfig) -> Schema:
    dims = list(cfg.per_slot_dims) if cfg.per_slot_dims else cfg.embed_dim
    return criteo_schema(vocab_size=cfg.vocab_size, embed_dim=dims)


def build_source(cfg: TrainConfig, schema: Schema, spec: str, seed: int,
                 shard_index: int = 0, shard_count: int = 1):
    if spec == "synthetic":
        return SyntheticSource(
            schema, cfg.batch_size, seed=seed, shard_index=shard_index, shard_count=shard_count
        )
    return CriteoTSVSource(
        spec,
        schema,
        cfg.batch_size,
        shard_index=shard_index,
        shard_count=shard_count,
        loop=True,
        shuffle_buffer=cfg.shuffle_buffer,
        seed=seed,
    )


class Trainer:
    """Single-host trainer; picks local vs sharded tables by device count."""

    def __init__(self, cfg: TrainConfig, logger: MetricsLogger | None = None):
        self.cfg = cfg
        self.schema = build_schema(cfg)
        self.logger = logger or MetricsLogger(cfg.tb_dir)
        model = build_model(cfg.model, self.schema, **cfg.model_kwargs())

        n_dev = cfg.n_devices or len(jax.devices())
        self.n_devices = n_dev
        if n_dev > 1:
            from recmodels_tpu.parallel import (
                build_parallel_engine,
                build_parallel_steps,
                make_mesh,
                shard_state,
            )

            self.mesh = make_mesh(n_dev)
            self.engine = build_parallel_engine(
                model,
                self.mesh,
                dense_optimizer=cfg.dense_optimizer,
                sparse_optimizer=cfg.sparse_optimizer,
                dense_lr=cfg.dense_lr,
                emb_lr=cfg.emb_lr,
                capacity_factor=cfg.capacity_factor,
            )
            self._shard = lambda s: shard_state(s, self.mesh)
            self.train_step, self.eval_step = build_parallel_steps(self.engine, self.mesh)
        else:
            self.mesh = None
            self.engine = Engine(
                model,
                dense_optimizer=cfg.dense_optimizer,
                sparse_optimizer=cfg.sparse_optimizer,
                dense_lr=cfg.dense_lr,
                emb_lr=cfg.emb_lr,
            )
            self._shard = lambda s: s
            self.train_step = self.engine.jit_train_step()
            self.eval_step = self.engine.jit_eval_step()

        self.ckpt = (
            CheckpointManager(cfg.ckpt_dir, save_interval_steps=cfg.ckpt_every)
            if cfg.ckpt_dir
            else None
        )
        self.profile_dir: str | None = None  # set to capture a trace of steps 10-20

    # ------------------------------------------------------------------ run
    def run(self) -> dict:
        cfg = self.cfg
        state = self._shard(self.engine.init(jax.random.key(cfg.seed)))
        from recmodels_tpu.parallel import multihost

        h_idx, h_cnt = multihost.host_shard()
        source = build_source(
            cfg, self.schema, cfg.data, seed=cfg.seed, shard_index=h_idx, shard_count=h_cnt
        )
        start_step = 0
        if self.ckpt is not None and self.ckpt.latest_step() is not None:
            state, data_state = self.ckpt.restore(state)
            source.set_state(data_state)
            start_step = int(state.step)
            self.logger.log_text(f"resumed from checkpoint at step {start_step}")
        if cfg.ckpt_dir:
            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            with open(os.path.join(cfg.ckpt_dir, "config.json"), "w") as f:
                f.write(cfg.to_json())

        it = iter(source)
        t_last = time.time()
        examples_since = 0
        final = {}
        for i in range(start_step, cfg.steps):
            if self.profile_dir is not None and i == 10:
                jax.profiler.start_trace(self.profile_dir)
            b = next(it)
            state, m = self.train_step(
                state, jnp.asarray(b.dense), jnp.asarray(b.ids), jnp.asarray(b.labels)
            )
            examples_since += b.size
            step_no = i + 1
            if self.profile_dir is not None and step_no == 20:
                jax.tree.leaves(state)[0].block_until_ready()
                jax.profiler.stop_trace()
                self.logger.log_text(f"profiler trace written to {self.profile_dir}")
            if step_no % cfg.log_every == 0:
                now = time.time()
                eps = examples_since / max(now - t_last, 1e-9)
                self.logger.log_scalars(
                    step_no, {"loss": float(m["loss"]), "examples_per_sec": eps}
                )
                t_last, examples_since = now, 0
            if cfg.eval_every and step_no % cfg.eval_every == 0:
                final = self.evaluate(state, step_no)
            if self.ckpt is not None:
                self.ckpt.save(step_no, state, data_state=source.state())
        if cfg.eval_every and (cfg.steps % cfg.eval_every) != 0:
            final = self.evaluate(state, cfg.steps)
        if self.ckpt is not None:
            if self.ckpt.latest_step() != cfg.steps:  # loop may have saved it
                self.ckpt.save(cfg.steps, state, data_state=source.state(), force=True)
            self.ckpt.wait()
        self.state = state
        return final

    def evaluate(self, state, step_no: int) -> dict:
        cfg = self.cfg
        val_spec = cfg.val_data or cfg.data
        from recmodels_tpu.parallel import multihost

        h_idx, h_cnt = multihost.host_shard()
        # held-out stream: synthetic uses a disjoint seed, same planted task;
        # each host evaluates its own shard (histograms psum-merge on mesh)
        val_src = build_source(
            cfg, self.schema, val_spec, seed=cfg.seed + 7_777_777,
            shard_index=h_idx, shard_count=h_cnt,
        )
        auc_state = metrics_lib.auc_init()
        vit = iter(val_src)
        for _ in range(cfg.eval_batches):
            b = next(vit)
            auc_state = self.eval_step(
                state, auc_state, jnp.asarray(b.dense), jnp.asarray(b.ids), jnp.asarray(b.labels)
            )
        out = metrics_lib.auc_compute(auc_state)
        scalars = {"auc": float(out["auc"]), "logloss": float(out["logloss"])}
        self.logger.log_scalars(step_no, scalars, prefix="val")
        return scalars
