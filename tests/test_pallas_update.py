"""Pallas sorted-scatter update kernel vs reference sparse Adagrad
(interpret mode on CPU; the same kernel compiles on TPU — exercised by
bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recmodels_tpu.embedding import pallas_update
from recmodels_tpu.embedding.optim import dedup_segment_sum, sparse_adagrad


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_update, "_INTERPRET", True)


def _setup(rows=2048, dim=16, n=700, seed=0, logical_rows=None):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    acc = jnp.asarray((np.abs(rng.normal(size=(rows, dim))) + 0.1).astype(np.float32))
    hi = logical_rows or rows
    ids = jnp.asarray(rng.integers(0, hi, size=(n,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    return table, acc, ids, grads


def test_kernel_matches_sparse_adagrad():
    table, acc, ids, grads = _setup()
    rows = table.shape[0]
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    lr, eps = 0.05, 1e-8

    t_k, a_k = pallas_update.sorted_adagrad_update(table, acc, uids, gsum, lr, eps)

    opt = sparse_adagrad(eps=eps)
    t_r, st = opt.apply(table, {"acc": acc}, uids, gsum, jnp.asarray(0), lr)
    # uids are UNIQUE (dedup'd) -> the exact 3-part f32 grad split makes the
    # kernel's reconstructed g bit-identical to gsum (pallas_update module
    # docstring #5). The residual below is NOT grad error: the compiler may
    # contract the elementwise `acc + g*g` into an FMA (single rounding) in
    # one path and not the other — verified by reproducing the exact kernel
    # value as fma(g, g, acc) — so the Adagrad outputs agree to ~1 ulp per
    # elementwise op, not bitwise.
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_r), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(st["acc"]), rtol=1e-5, atol=1e-7)


def test_kernel_untouched_rows_unchanged():
    table, acc, ids, grads = _setup(n=50)
    rows = table.shape[0]
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    t_k, a_k = pallas_update.sorted_adagrad_update(table, acc, uids, gsum, 0.1, 1e-8)
    touched = set(np.asarray(ids).tolist())
    untouched = [r for r in range(rows) if r not in touched][:20]
    np.testing.assert_array_equal(np.asarray(t_k)[untouched], np.asarray(table)[untouched])
    np.testing.assert_array_equal(np.asarray(a_k)[untouched], np.asarray(acc)[untouched])


def test_kernel_heavy_duplicates_single_row():
    """All ids identical: one unique update; rest are sentinel no-ops."""
    table, acc, _, grads = _setup(n=600)
    rows = table.shape[0]
    ids = jnp.full((600,), 777, jnp.int32)
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    t_k, a_k = pallas_update.sorted_adagrad_update(table, acc, uids, gsum, 0.05, 1e-8)
    g = np.asarray(grads).sum(0)
    a_exp = np.asarray(acc)[777] + g * g
    t_exp = np.asarray(table)[777] - 0.05 * g / (np.sqrt(a_exp) + 1e-8)
    np.testing.assert_allclose(np.asarray(t_k)[777], t_exp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k)[777], a_exp, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(t_k)[778], np.asarray(table)[778])


def test_kernel_sentinels_in_alloc_padding_are_noops():
    """Sentinels that land inside allocation padding carry zero grads."""
    table, acc, ids, grads = _setup(rows=2048, n=300, logical_rows=1500)
    uids, gsum, _ = dedup_segment_sum(ids, grads, 1500)  # sentinels from 1500
    t_k, a_k = pallas_update.sorted_adagrad_update(table, acc, uids, gsum, 0.05, 1e-8)
    # pad rows (>=1500) untouched because their gsum rows are zero
    np.testing.assert_allclose(
        np.asarray(t_k)[1500:], np.asarray(table)[1500:], rtol=0, atol=0
    )


def test_engine_route_uses_kernel_and_matches_xla_route(monkeypatch):
    """LocalTables via apply_updates (kernel) == dense XLA path numerically."""
    from recmodels_tpu.embedding.optim import apply_updates

    table, acc, ids, grads = _setup(rows=4096, dim=8, n=1000)
    opt = sparse_adagrad()
    t_k, s_k = apply_updates(opt, table, {"acc": acc}, ids, grads, jnp.asarray(0), 0.02)
    # force non-kernel route
    monkeypatch.setattr(pallas_update, "_INTERPRET", False)
    monkeypatch.setattr(pallas_update, "supported", lambda t: False)
    t_d, s_d = apply_updates(opt, table, {"acc": acc}, ids, grads, jnp.asarray(0), 0.02)
    # grads are exact (3-part split); the residuals are (a) the f32 summation
    # ORDER of duplicate-id grads (kernel: chunk-position MXU accumulation;
    # XLA: segment-sum) and (b) compiler FMA contraction of the elementwise
    # Adagrad math (see test_kernel_matches_sparse_adagrad) — ulp-scale, not
    # the old ~2^-17 hi/lo approximation
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_d), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_k["acc"]), np.asarray(s_d["acc"]), rtol=1e-5, atol=1e-6
    )


def test_split_exact_bf16_roundtrips_f32():
    """The 3-part truncating split reconstructs normal f32 exactly."""
    rng = np.random.default_rng(7)
    x = np.concatenate(
        [
            rng.normal(size=1000).astype(np.float32),
            np.asarray([0.0, -0.0, 1e-30, -1e30, np.pi], np.float32),
            (rng.normal(size=100) * 1e20).astype(np.float32),
        ]
    )
    parts = pallas_update.split_exact_bf16(jnp.asarray(x))
    assert all(p.dtype == jnp.bfloat16 for p in parts) and len(parts) == 3
    total = sum(p.astype(jnp.float32) for p in parts)
    np.testing.assert_array_equal(np.asarray(total), x)


def _setup_adam(rows=2048, dim=17, n=700, seed=3):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32) * 0.01)
    v = jnp.asarray((np.abs(rng.normal(size=(rows, dim))) * 0.01).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, size=(n,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    return table, m, v, ids, grads


def test_packed_adam_kernel_matches_lazy_adam_oracle():
    """sorted_adam_update_packed vs optim.sparse_adam (dedup + apply),
    DUPLICATE ids included, on the packed layout (VERDICT r3 #2 'oracle
    parity test vs sparse_adam.apply incl duplicates')."""
    from recmodels_tpu.embedding import pallas_gather
    from recmodels_tpu.embedding.optim import sparse_adam

    table, m, v, ids, grads = _setup_adam()
    rows, dim = table.shape
    lr, step = 0.05, 7
    b1, b2, eps = 0.9, 0.999, 1e-8

    # oracle: dedup + lazy-adam on the 2-D master
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    opt = sparse_adam(b1=b1, b2=b2, eps=eps)
    t_r, st_r = opt.apply(table, {"m": m, "v": v}, uids, gsum,
                          jnp.asarray(step), lr)

    # kernel: raw sorted stream on the packed layout
    tr = 512
    packed_t = pallas_gather.pack(table, tr)
    packed_m = pallas_gather.pack(m, tr)
    packed_v = pallas_gather.pack(v, tr)
    order = jnp.argsort(ids)
    t_k, m_k, v_k = pallas_update.sorted_adam_update_packed(
        packed_t, packed_m, packed_v, ids[order],
        jnp.take(grads, order, axis=0), lr, jnp.asarray(step), b1, b2, eps,
    )
    for got, want in ((t_k, t_r), (m_k, st_r["m"]), (v_k, st_r["v"])):
        got2 = np.asarray(pallas_gather.unpack(got, dim))
        np.testing.assert_allclose(got2, np.asarray(want), rtol=2e-5, atol=1e-6)


def test_packed_adam_untouched_rows_bitwise_unchanged():
    """Lazy semantics: rows outside the id set must not decay (the count
    feature row gates the moment update on membership, not g != 0)."""
    from recmodels_tpu.embedding import pallas_gather

    table, m, v, ids, grads = _setup_adam(n=40)
    rows, dim = table.shape
    # include a touched row whose grads sum EXACTLY to zero: it must still
    # decay (membership, not g != 0)
    ids = jnp.concatenate([ids, jnp.asarray([123, 123], jnp.int32)])
    gz = np.zeros((2, dim), np.float32)
    gz[0] = 1.5
    gz[1] = -1.5
    grads = jnp.concatenate([grads, jnp.asarray(gz)])
    tr = 512
    order = jnp.argsort(ids)
    t_k, m_k, v_k = pallas_update.sorted_adam_update_packed(
        pallas_gather.pack(table, tr), pallas_gather.pack(m, tr),
        pallas_gather.pack(v, tr), ids[order],
        jnp.take(grads, order, axis=0), 0.05, jnp.asarray(0), 0.9, 0.999, 1e-8,
    )
    t2 = np.asarray(pallas_gather.unpack(t_k, dim))
    m2 = np.asarray(pallas_gather.unpack(m_k, dim))
    v2 = np.asarray(pallas_gather.unpack(v_k, dim))
    touched = set(np.asarray(ids).tolist())
    untouched = [r for r in range(rows) if r not in touched][:30]
    np.testing.assert_array_equal(t2[untouched], np.asarray(table)[untouched])
    np.testing.assert_array_equal(m2[untouched], np.asarray(m)[untouched])
    np.testing.assert_array_equal(v2[untouched], np.asarray(v)[untouched])
    # zero-sum duplicate row: moments DID decay (m *= b1), table moved only
    # by the (zero) grad term
    np.testing.assert_allclose(m2[123], 0.9 * np.asarray(m)[123], rtol=1e-6)
    np.testing.assert_allclose(v2[123], 0.999 * np.asarray(v)[123], rtol=1e-6)


def test_packed_adam_padding_columns_stay_zero():
    """Sublane-padding feature columns (d_count..d8-1 of the packed layout,
    which include the injected count row's index) must come out of the Adam
    kernel exactly as they went in — zero (ADVICE r4 #1: the count row
    survived the g[:d] slice and fed a spurious update into them)."""
    from recmodels_tpu.embedding import pallas_gather

    table, m, v, ids, grads = _setup_adam(dim=17)  # d8 = 24 > d_count = 17
    tr = 512
    pt = pallas_gather.pack(table, tr)
    pm = pallas_gather.pack(m, tr)
    pv = pallas_gather.pack(v, tr)
    assert pt.shape[1] == 24
    order = jnp.argsort(ids)
    t_k, m_k, v_k = pallas_update.sorted_adam_update_packed(
        pt, pm, pv, ids[order], jnp.take(grads, order, axis=0),
        0.05, jnp.asarray(3), 0.9, 0.999, 1e-8,
    )
    for got in (t_k, m_k, v_k):
        pad = np.asarray(got)[:, 17:, :]
        np.testing.assert_array_equal(pad, np.zeros_like(pad))
