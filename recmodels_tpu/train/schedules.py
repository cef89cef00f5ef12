"""Learning-rate schedules — parity with the reference's OptimMethod
LearningRateSchedule family (BigDL ``optim.SGD.LearningRateSchedule``:
Default/Poly/Exponential/Plateau etc., SURVEY.md §2a #11). Built on optax
schedules; the same schedule object drives BOTH the dense optimizer (passed
straight to optax) and the sparse embedding optimizer (via
``Engine.emb_lr_schedule``, evaluated in-graph at each step).
"""

from __future__ import annotations

from typing import Callable

import optax

KINDS = ("constant", "linear", "cosine", "exponential")


def build_lr_schedule(
    base_lr: float,
    kind: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 0,
    end_scale: float = 0.0,
    decay_rate: float = 0.96,
    decay_every: int = 1000,
) -> Callable | float:
    """step -> lr. Returns the plain float when there is nothing to schedule
    (constant, no warmup) so optimizers keep their scalar fast path.

    kinds: constant | linear (to end_scale*base over total_steps) |
    cosine (optax warmup_cosine to end_scale*base) | exponential
    (base * decay_rate^(step/decay_every), staircase=False).
    """
    if kind not in KINDS:
        raise ValueError(f"unknown lr schedule '{kind}'; have {KINDS}")
    if kind == "constant" and warmup_steps <= 0:
        return base_lr
    end = base_lr * end_scale
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else base_lr,
            peak_value=base_lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=end,
        )
    if kind == "linear":
        body = optax.linear_schedule(
            init_value=base_lr,
            end_value=end,
            transition_steps=max(total_steps - warmup_steps, 1),
        )
    elif kind == "exponential":
        body = optax.exponential_decay(
            init_value=base_lr,
            transition_steps=max(decay_every, 1),
            decay_rate=decay_rate,
        )
    else:  # constant body with warmup
        body = optax.constant_schedule(base_lr)
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        return optax.join_schedules([warmup, body], [warmup_steps])
    return body
