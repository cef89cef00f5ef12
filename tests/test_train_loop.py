"""Trainer loop + CLI + config tests."""

import numpy as np
import jax

from recmodels_tpu.utils.config import TrainConfig
from recmodels_tpu.train.loop import Trainer
from recmodels_tpu.utils.logging import MetricsLogger


def _cfg(**kw):
    base = dict(
        model="fm",
        vocab_size=500,
        embed_dim=8,
        batch_size=256,
        steps=150,
        log_every=50,
        eval_every=150,
        eval_batches=5,
        emb_lr=5e-2,
        n_devices=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_trainer_single_device_learns(tmp_path):
    t = Trainer(_cfg(tb_dir=None), logger=MetricsLogger())
    final = t.run()
    assert final["auc"] > 0.65


def test_trainer_sharded_8dev(tmp_path):
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 fake devices")
    t = Trainer(_cfg(n_devices=8, capacity_factor=4.0))
    final = t.run()
    assert final["auc"] > 0.65


def test_trainer_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "run")
    # full run: 40 steps straight
    t1 = Trainer(_cfg(steps=40, eval_every=0, ckpt_dir=ckpt + "_a", ckpt_every=10))
    t1.run()
    # interrupted run: 20 steps, then a NEW trainer resumes to 40
    t2 = Trainer(_cfg(steps=20, eval_every=0, ckpt_dir=ckpt + "_b", ckpt_every=10))
    t2.run()
    t3 = Trainer(_cfg(steps=40, eval_every=0, ckpt_dir=ckpt + "_b", ckpt_every=10))
    t3.run()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t1.state,
        t3.state,
    )


def test_config_roundtrip_and_overrides():
    cfg = TrainConfig()
    s = cfg.to_json()
    cfg2 = TrainConfig.from_json(s)
    assert cfg == cfg2
    cfg3 = cfg.apply_overrides(["batch_size=64", "hidden=(8, 8)", "data='x.tsv'"])
    assert cfg3.batch_size == 64 and cfg3.hidden == (8, 8) and cfg3.data == "x.tsv"
    try:
        cfg.apply_overrides(["nope=1"])
        assert False
    except KeyError:
        pass


def test_cli_smoke(capsys):
    import train as cli

    rc = cli.main(
        [
            "--model", "lr", "--steps", "20", "--batch-size", "64", "--devices", "1",
            "--set", "vocab_size=200", "--set", "eval_every=20", "--set", "eval_batches=2",
            "--set", "log_every=10",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "done:" in out and "auc" in out
