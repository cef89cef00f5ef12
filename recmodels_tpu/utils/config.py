"""Frozen dataclass run config (SURVEY.md §5.6: replaces the reference's
scopt CLI args + SparkConf). JSON round-trips into the checkpoint dir so a
run is reproducible from its artifacts."""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # model
    model: str = "xdeepfm"
    hidden: tuple = (400, 400)
    cin_sizes: tuple = (128, 128)
    pnn_mode: str = "both"
    n_cross: int = 3
    attention_dim: int = 32  # AFM attention width (arXiv:1708.04617)
    bf16: bool = False
    # schema (BASELINE.json:7-9)
    vocab_size: int = 100_000
    embed_dim: int = 16
    per_slot_dims: tuple | None = None  # overrides embed_dim when set
    # optimizers
    dense_optimizer: str = "adam"
    sparse_optimizer: str = "adagrad"
    dense_lr: float = 1e-3
    emb_lr: float = 1e-2
    # LR schedule (applies to BOTH lrs; train/schedules.py):
    # constant | linear | cosine | exponential, with optional linear warmup
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_end_scale: float = 0.0  # final lr as a fraction of base (linear/cosine)
    dense_weight_decay: float = 0.0  # decoupled L2 on dense params
    # data
    data: str = "synthetic"  # "synthetic" | path to criteo TSV
    val_data: str | None = None
    batch_size: int = 8192
    shuffle_buffer: int = 0  # >0: windowed shuffle of the TSV stream
    # schedule
    steps: int = 1000
    log_every: int = 50
    eval_every: int = 500
    eval_batches: int = 20
    # distribution
    n_devices: int | None = None  # None = all; 1 = local tables
    capacity_factor: float = 1.25
    # dispatch: steps per device program (lax.scan superbatch). >1 amortizes
    # host dispatch latency; 1 keeps the step-at-a-time path.
    scan_steps: int = 1
    # gradient accumulation (SURVEY §2c "optional batch-split accumulation"):
    # >1 splits each batch into this many micro-batches, runs fwd/bwd per
    # micro-batch (peak activation memory = one micro-batch) and applies
    # BOTH optimizers once on the averaged grads — numerically the
    # full-batch step up to f32 summation order. batch_size must divide.
    accum_steps: int = 1
    prefetch_batches: int = 2  # host-side parse/stack pipeline depth
    # parallel batch-generation workers (spawned processes) for
    # random-access sources (synthetic). 0 = auto (min(8, cpus/2) for
    # synthetic data, 1 otherwise); 1 = in-thread generation.
    producer_workers: int = 0
    # io
    ckpt_dir: str | None = None
    ckpt_every: int = 1000
    tb_dir: str | None = None
    seed: int = 0

    def model_kwargs(self) -> dict:
        import jax.numpy as jnp

        kw = {}
        if self.model in ("deepfm", "pnn", "dcn", "xdeepfm", "widedeep", "nfm"):
            kw["hidden"] = tuple(self.hidden)
        if self.bf16 and self.model not in ("lr", "fm"):
            kw["compute_dtype"] = jnp.bfloat16
        if self.model == "xdeepfm":
            kw["cin_sizes"] = tuple(self.cin_sizes)
        if self.model == "pnn":
            kw["mode"] = self.pnn_mode
        if self.model == "dcn":
            kw["n_cross"] = self.n_cross
        if self.model == "afm":
            kw["attention_dim"] = self.attention_dim
        return kw

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        d = json.loads(s)
        for k in ("hidden", "cin_sizes"):
            if k in d and d[k] is not None:
                d[k] = tuple(d[k])
        if d.get("per_slot_dims") is not None:
            d["per_slot_dims"] = tuple(d["per_slot_dims"])
        return cls(**d)

    def apply_overrides(self, overrides: Sequence[str]) -> "TrainConfig":
        """'key=value' overrides with literal-eval'd values."""
        import ast

        d = dataclasses.asdict(self)
        for ov in overrides:
            k, _, v = ov.partition("=")
            if k not in d:
                raise KeyError(f"unknown config key: {k}")
            try:
                d[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                d[k] = v  # bare string
        return TrainConfig.from_json(json.dumps(d, default=list))
