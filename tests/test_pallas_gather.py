"""Pallas sweep-gather kernel + packed-layout update vs XLA references
(interpret mode on CPU; the same kernels compile on TPU — exercised by
bench.py and the `tpu` pytest lane)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recmodels_tpu.embedding import pallas_gather, pallas_update
from recmodels_tpu.embedding.optim import dedup_segment_sum, sparse_adagrad


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_gather, "_INTERPRET", True)
    monkeypatch.setattr(pallas_update, "_INTERPRET", True)


def _table(rows=4096, dim=17, seed=0):
    rng = np.random.default_rng(seed)
    return rng, jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))


def test_pack_unpack_roundtrip():
    _, table = _table()
    packed = pallas_gather.pack(table)
    # feature dim sublane-padded 17 -> 24 (costs no extra HBM bytes over the
    # (8,128)-tiled physical layout)
    assert packed.shape == (table.shape[0] // pallas_gather.TR, 24, pallas_gather.TR)
    np.testing.assert_array_equal(
        np.asarray(pallas_gather.unpack(packed, 17)), np.asarray(table)
    )


@pytest.mark.parametrize("n", [100, 512, 1337])
def test_sweep_gather_matches_take(n):
    rng, table = _table()
    packed = pallas_gather.pack(table)
    ids = np.sort(rng.integers(0, table.shape[0], size=n)).astype(np.int32)
    out = pallas_gather.sorted_gather(packed, jnp.asarray(ids))[:, : table.shape[1]]
    ref = table[ids].astype(jnp.bfloat16)  # exact per-value cast
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sweep_gather_duplicates_and_skew():
    """Heavy duplicates + all ids inside one tile + a far outlier."""
    rng, table = _table()
    ids = np.sort(
        np.concatenate(
            [
                np.zeros(100, np.int32),
                rng.integers(0, pallas_gather.TR, size=300).astype(np.int32),
                np.asarray([table.shape[0] - 1], np.int32),
            ]
        )
    )
    packed = pallas_gather.pack(table)
    out = pallas_gather.sorted_gather(packed, jnp.asarray(ids))[:, : table.shape[1]]
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table[ids].astype(jnp.bfloat16))
    )


def test_packed_update_matches_2d_kernel():
    rng, table = _table(rows=2048, dim=16)
    acc = jnp.asarray((np.abs(rng.normal(size=table.shape)) + 0.1).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 2048, size=(700,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(700, 16)).astype(np.float32))
    uids, gsum, _ = dedup_segment_sum(ids, grads, 2048)

    t2, a2 = pallas_update.sorted_adagrad_update(table, acc, uids, gsum, 0.05, 1e-8)
    tp, ap = pallas_update.sorted_adagrad_update_packed(
        pallas_gather.pack(table), pallas_gather.pack(acc), uids, gsum, 0.05, 1e-8
    )
    np.testing.assert_array_equal(np.asarray(pallas_gather.unpack(tp)), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(pallas_gather.unpack(ap)), np.asarray(a2))


def test_packed_update_via_apply_updates_routes_by_ndim():
    from recmodels_tpu.embedding.optim import apply_updates

    rng, table = _table(rows=2048, dim=16)
    acc_np = (np.abs(rng.normal(size=table.shape)) + 0.1).astype(np.float32)
    ids = jnp.asarray(rng.integers(0, 2048, size=(500,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
    opt = sparse_adagrad()

    t2, s2 = apply_updates(opt, table, {"acc": jnp.asarray(acc_np)}, ids, grads,
                           jnp.asarray(0), 0.02)
    tp, sp = apply_updates(
        opt, pallas_gather.pack(table),
        {"acc": pallas_gather.pack(jnp.asarray(acc_np))}, ids, grads,
        jnp.asarray(0), 0.02,
    )
    np.testing.assert_array_equal(np.asarray(pallas_gather.unpack(tp)), np.asarray(t2))
    np.testing.assert_array_equal(
        np.asarray(pallas_gather.unpack(sp["acc"])), np.asarray(s2["acc"])
    )


def test_engine_packed_train_step_matches_unpacked():
    """A bf16 xdeepfm train step with packed tables (Pallas gather + packed
    update, interpret mode) must match the same step with packing disabled
    (XLA gather + 2-D kernel) — same math, different layout/kernels."""
    from recmodels_tpu.data.schema import criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=1024, embed_dim=8)
    rng = np.random.default_rng(3)
    b = 64
    dense = jnp.asarray(rng.normal(size=(b, schema.n_dense)).astype(np.float32))
    ids = jnp.asarray(
        rng.integers(0, 1024, size=(b, schema.n_slots)).astype(np.int32)
    )
    labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.float32))

    def run(fast):
        model = build_model("xdeepfm", schema, cin_sizes=(8, 8), hidden=(16,),
                            compute_dtype=jnp.bfloat16)
        eng = Engine(model=model, sparse_optimizer="adagrad")
        if not fast:
            eng.table_strategy.fast_dtype = None
        state = eng.init(jax.random.key(0))
        state, m = eng.train_step(state, dense, ids, labels)
        emb = state.emb_params["emb"]
        emb = {
            k: (pallas_gather.unpack(v, 9) if v.ndim == 3 else v)
            for k, v in emb.items()
        }
        return m["loss"], emb

    loss_p, emb_p = run(fast=True)
    loss_u, emb_u = run(fast=False)
    assert any(True for _ in emb_p)
    np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)
    for k in emb_p:
        np.testing.assert_allclose(
            np.asarray(emb_p[k]), np.asarray(emb_u[k]), rtol=2e-3, atol=2e-5
        )


@pytest.mark.parametrize("n", [100, 512, 1337])
def test_sweep_gather_f32_bit_exact(n):
    """out_dtype=f32 from an f32 table: the 3-part exact emission must be
    BIT-IDENTICAL to an XLA gather (ADVICE.md r2 #2), duplicates included."""
    rng, table = _table()
    packed = pallas_gather.pack(table)
    ids = np.sort(
        np.concatenate(
            [
                rng.integers(0, table.shape[0], size=n - 60),
                np.zeros(50, np.int64),  # duplicate/skew block
                np.full(10, table.shape[0] - 1),
            ]
        )
    ).astype(np.int32)
    out = pallas_gather.sorted_gather(
        packed, jnp.asarray(ids), out_dtype=jnp.float32
    )[:, : table.shape[1]]
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[ids]))


def test_engine_f32_packed_train_step_matches_unpacked():
    """An f32 FM train step with packed tables (exact 3-part Pallas gather +
    exact 3-part-split packed update) vs packing disabled (XLA gather + 2-D
    kernel): identical math up to duplicate-sum order (ADVICE.md r2 #1/#2)."""
    from recmodels_tpu.data.schema import criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=1024, embed_dim=8)
    rng = np.random.default_rng(11)
    b = 64
    dense = jnp.asarray(rng.normal(size=(b, schema.n_dense)).astype(np.float32))
    ids = jnp.asarray(
        rng.integers(0, 1024, size=(b, schema.n_slots)).astype(np.int32)
    )
    labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.float32))

    def run(fast):
        model = build_model("fm", schema)
        assert getattr(model, "compute_dtype", jnp.float32) == jnp.float32
        eng = Engine(model=model, sparse_optimizer="adagrad")
        if not fast:
            eng.table_strategy.fast_dtype = None
        else:
            assert eng.table_strategy.fast_dtype == jnp.float32
        state = eng.init(jax.random.key(0))
        for _ in range(3):
            state, m = eng.train_step(state, dense, ids, labels)
        emb = {
            k: (pallas_gather.unpack(v, 9) if v.ndim == 3 else v)
            for k, v in state.emb_params["emb"].items()
        }
        return m["loss"], emb

    loss_p, emb_p = run(fast=True)
    loss_u, emb_u = run(fast=False)
    assert emb_p.keys() == emb_u.keys() and len(emb_p) > 0
    # forward rows are bit-exact; the update differs only in f32
    # duplicate-sum order -> losses and tables agree to f32 ulp scale
    np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-6)
    for k in emb_p:
        np.testing.assert_allclose(
            np.asarray(emb_p[k]), np.asarray(emb_u[k]), rtol=1e-5, atol=1e-7
        )
