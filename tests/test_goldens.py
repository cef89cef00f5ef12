"""Fixed-seed regression goldens (SURVEY.md §4 item 4): a deterministic
400-step run must reproduce the recorded validation AUC/logloss. Guards the
whole numerical stack — hashing, init, interaction math, optimizers,
metrics — against silent drift. Tolerance covers CPU fp reassociation
across XLA versions, not semantic change."""

import pytest

from recmodels_tpu.train.loop import Trainer
from recmodels_tpu.utils.config import TrainConfig

GOLDENS = {
    # recorded 2026-08-17 on CPU backend, jax 0.9.0, after wide-column
    # fusion (which changes init RNG stream consumption — re-pin goldens
    # whenever the init stream intentionally changes)
    "fm": {"auc": 0.780055, "logloss": 0.592241},
    "xdeepfm": {"auc": 0.787954, "logloss": 0.560821},
}


@pytest.mark.slow
@pytest.mark.parametrize("model", sorted(GOLDENS))
def test_fixed_seed_golden(model):
    cfg = TrainConfig(
        model=model,
        vocab_size=2000,
        embed_dim=8,
        batch_size=256,
        steps=400,
        log_every=1000,
        eval_every=400,
        eval_batches=10,
        emb_lr=5e-2,
        dense_lr=2e-3,
        n_devices=1,
        seed=123,
        hidden=(64, 64),
        cin_sizes=(16, 16),
    )
    out = Trainer(cfg).run()
    g = GOLDENS[model]
    assert abs(out["auc"] - g["auc"]) < 2e-3, (out, g)
    assert abs(out["logloss"] - g["logloss"]) < 4e-3, (out, g)
