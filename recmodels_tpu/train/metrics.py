"""Streaming, mergeable evaluation metrics: ROC-AUC and logloss.

The reference computes validation AUC/Loss by merging per-partition
``ValidationMethod`` partial results on the Spark driver (SURVEY.md §3.3).
The TPU-native equivalent must be a state that merges with ``psum`` across
the mesh: a fixed-bin score histogram (SURVEY.md §5.8, §7 hard part 6).

AUC from histograms: with positives/negatives histogrammed over K score
bins, AUC = P(s⁺ > s⁻) + ½P(s⁺ = s⁻) ≈
``Σ_k pos_k · (cumneg_{<k} + ½ neg_k) / (P·N)``. Bias vs exact AUC is
O(1/K); K=16384 keeps it far below the 1e-4 validation tolerance
(verified against sklearn-style exact AUC in tests/test_metrics.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_BINS = 16384


class AUCState(NamedTuple):
    """psum-mergeable streaming state for AUC + logloss."""

    pos_hist: jnp.ndarray  # f64-ish counts as f32 [K]
    neg_hist: jnp.ndarray  # [K]
    loss_sum: jnp.ndarray  # scalar Σ bce
    count: jnp.ndarray  # scalar n


def auc_init(n_bins: int = DEFAULT_BINS) -> AUCState:
    return AUCState(
        pos_hist=jnp.zeros((n_bins,), jnp.float32),
        neg_hist=jnp.zeros((n_bins,), jnp.float32),
        loss_sum=jnp.zeros((), jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def auc_update(
    state: AUCState, logits: jnp.ndarray, labels: jnp.ndarray, weight: jnp.ndarray | None = None
) -> AUCState:
    """Accumulate a batch. logits: [B]; labels: [B] in {0,1}."""
    n_bins = state.pos_hist.shape[0]
    p = jax.nn.sigmoid(logits)
    idx = jnp.clip((p * n_bins).astype(jnp.int32), 0, n_bins - 1)
    w = jnp.ones_like(labels) if weight is None else weight
    pos = jax.ops.segment_sum(labels * w, idx, num_segments=n_bins)
    neg = jax.ops.segment_sum((1.0 - labels) * w, idx, num_segments=n_bins)
    bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return AUCState(
        pos_hist=state.pos_hist + pos,
        neg_hist=state.neg_hist + neg,
        loss_sum=state.loss_sum + jnp.sum(bce * w),
        count=state.count + jnp.sum(w),
    )


def auc_merge(a: AUCState, b: AUCState) -> AUCState:
    return AUCState(*(x + y for x, y in zip(a, b)))


def auc_compute(state: AUCState) -> dict:
    """Finalize: {'auc', 'logloss', 'accuracy', 'count'} from the streaming
    state (accuracy at the 0.5 threshold — BigDL ``ValidationMethod``
    family parity; derived from the same histograms, so it shares the
    O(1/K) binning tolerance)."""
    pos = state.pos_hist.astype(jnp.float64) if jax.config.jax_enable_x64 else state.pos_hist
    neg = state.neg_hist.astype(pos.dtype)
    total_pos = jnp.sum(pos)
    total_neg = jnp.sum(neg)
    cum_neg = jnp.cumsum(neg) - neg  # negatives strictly below this bin
    wins = jnp.sum(pos * (cum_neg + 0.5 * neg))
    denom = jnp.maximum(total_pos * total_neg, 1.0)
    auc = wins / denom
    logloss = state.loss_sum / jnp.maximum(state.count, 1.0)
    half = state.pos_hist.shape[0] // 2  # bin index of score 0.5
    correct = jnp.sum(pos[half:]) + jnp.sum(neg[:half])
    accuracy = correct / jnp.maximum(total_pos + total_neg, 1.0)
    return {"auc": auc, "logloss": logloss, "accuracy": accuracy,
            "count": state.count}
