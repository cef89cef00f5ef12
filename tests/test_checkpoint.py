"""Checkpoint/resume: bit-identical continuation after restore
(SURVEY.md §5.3 'asserts bitwise-identical resume')."""

import numpy as np
import jax
import jax.numpy as jnp

from recmodels_tpu.data import SyntheticSource, criteo_schema
from recmodels_tpu.models import build_model
from recmodels_tpu.train.checkpoint import CheckpointManager
from recmodels_tpu.train.engine import Engine

SCH = criteo_schema(vocab_size=300, embed_dim=8)


def _args(b):
    return jnp.asarray(b.dense), jnp.asarray(b.ids), jnp.asarray(b.labels)


def test_save_restore_resume_bitwise(tmp_path):
    model = build_model("fm", SCH)
    eng = Engine(model, dense_lr=1e-2, emb_lr=5e-2)
    state = eng.init(jax.random.key(0))
    step = eng.jit_train_step(donate=False)
    src = SyntheticSource(SCH, batch_size=64, seed=0)
    it = iter(src)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    for i in range(5):
        state, _ = step(state, *_args(next(it)))
    mgr.save(5, state, data_state=src.state())
    mgr.wait()

    # continue original run 3 more steps
    cont_state = state
    for i in range(3):
        cont_state, _ = step(cont_state, *_args(next(it)))

    # fresh process simulation: new engine, restore, re-run the same 3 steps
    eng2 = Engine(model, dense_lr=1e-2, emb_lr=5e-2)
    abstract = eng2.init(jax.random.key(1))  # different rng: values overwritten
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr2.latest_step() == 5
    restored, data_state = mgr2.restore(abstract)
    assert int(restored.step) == 5
    src2 = SyntheticSource(SCH, batch_size=64, seed=0)
    src2.set_state(data_state)
    it2 = iter(src2)
    step2 = eng2.jit_train_step(donate=False)
    for i in range(3):
        restored, _ = step2(restored, *_args(next(it2)))

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        cont_state,
        restored,
    )
    mgr.close()
    mgr2.close()


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    model = build_model("lr", SCH)
    eng = Engine(model)
    try:
        mgr.restore(eng.init(jax.random.key(0)))
        assert False, "should raise"
    except FileNotFoundError:
        pass
