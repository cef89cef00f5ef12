"""Profiling / tracing (SURVEY.md §5.1 — replaces Spark UI timelines +
BigDL per-iteration accumulators): thin wrappers over jax.profiler emitting
TensorBoard trace-viewer protos, plus a step-time tracker for throughput
accounting that does not force per-step host syncs."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock EMA of step dispatch intervals (cheap; no device sync)."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self._last = None
        self.ema_s = None

    def tick(self) -> float | None:
        now = time.time()
        if self._last is not None:
            dt = now - self._last
            self.ema_s = dt if self.ema_s is None else (1 - self.alpha) * self.ema_s + self.alpha * dt
        self._last = now
        return self.ema_s
