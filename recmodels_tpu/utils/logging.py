"""Metrics logging: structured stdout + TensorBoard (SURVEY.md §5.5 —
replaces BigDL TrainSummary/ValidationSummary). All metrics are computed
in-graph and fetched once per log interval; no per-step host sync."""

from __future__ import annotations

import json
import sys
import time


class MetricsLogger:
    def __init__(self, tb_dir: str | None = None, stream=None):
        self.stream = stream or sys.stdout
        self._writer = None
        if tb_dir:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(tb_dir)
            except ImportError:
                self.log_text("tensorboardX unavailable; TB logging disabled")
        self._t0 = time.time()

    def log_text(self, msg: str):
        print(f"[{time.time() - self._t0:8.1f}s] {msg}", file=self.stream, flush=True)

    def log_scalars(self, step: int, scalars: dict, prefix: str = "train"):
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.add_scalar(f"{prefix}/{k}", float(v), step)
        payload = {k: round(float(v), 6) for k, v in scalars.items()}
        self.log_text(f"step {step:>8d} {prefix} {json.dumps(payload)}")

    def close(self):
        if self._writer is not None:
            self._writer.close()
