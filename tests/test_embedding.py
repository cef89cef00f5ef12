"""EmbeddingCollection + sparse optimizer tests (SURVEY.md §7 hard parts 1-2)."""

import numpy as np
import jax
import jax.numpy as jnp

from recmodels_tpu.data.schema import criteo_schema
from recmodels_tpu.embedding import EmbeddingCollection, dedup_segment_sum
from recmodels_tpu.embedding.optim import sparse_adagrad, sparse_adam


def small_schema(dims=8):
    return criteo_schema(vocab_size=[50 + 10 * i for i in range(26)], embed_dim=dims)


def test_lookup_shapes_uniform():
    sch = small_schema(8)
    coll = EmbeddingCollection(sch)
    params = coll.init(jax.random.key(0))
    assert len(coll.groups) == 1
    ids = jnp.zeros((4, 26), jnp.int32)
    out = coll.lookup(params, ids)
    assert out.shape == (4, 26, 8)


def test_lookup_per_slot_dims_padding():
    dims = [4] * 10 + [8] * 10 + [16] * 6
    sch = criteo_schema(vocab_size=100, embed_dim=dims)
    coll = EmbeddingCollection(sch)
    assert len(coll.groups) == 3
    params = coll.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, size=(3, 26)).astype(np.int32))
    out = np.asarray(coll.lookup(params, ids))
    assert out.shape == (3, 26, 16)
    # slots with dim 4 must be zero beyond lane 4
    assert np.abs(out[:, 0, 4:]).max() == 0
    assert np.abs(out[:, 10, 8:]).max() == 0
    assert np.abs(out[:, 25, :]).max() > 0


def test_lookup_matches_per_slot_manual():
    sch = small_schema(8)
    coll = EmbeddingCollection(sch)
    params = coll.init(jax.random.key(1))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 50, size=(5, 26)).astype(np.int32)
    out = np.asarray(coll.lookup(params, jnp.asarray(ids)))
    table = np.asarray(params["d8"])
    g = coll.groups[0]
    for s_pos, slot in enumerate(g.slot_indices):
        off = g.row_offsets[s_pos]
        np.testing.assert_allclose(out[:, slot, :], table[ids[:, slot] + off])


def test_dedup_segment_sum_accumulates_duplicates():
    ids = jnp.asarray(np.array([3, 1, 3, 3, 7, 1], np.int32))
    grads = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    uids, gsum, valid = dedup_segment_sum(ids, grads, num_rows=10)
    got = {}
    for u, g, v in zip(np.asarray(uids), np.asarray(gsum), np.asarray(valid)):
        if v:
            got[int(u)] = g.tolist()
    assert got == {
        1: [2 + 10.0, 3 + 11.0],
        3: [0 + 4 + 6.0, 1 + 5 + 7.0],
        7: [8.0, 9.0],
    }
    # padding entries must carry strictly-sorted unique out-of-bounds sentinels
    pad = np.asarray(uids)[np.asarray(valid) == False]  # noqa: E712
    assert np.all(pad >= 10) and len(set(pad.tolist())) == len(pad)
    assert np.all(np.diff(np.asarray(uids)) > 0)  # fully sorted + unique


def test_sparse_adagrad_equals_dense_adagrad():
    """Sparse-on-touched-rows Adagrad == dense Adagrad over multiple steps."""
    num_rows, dim = 20, 4
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(num_rows, dim)).astype(np.float32))
    opt = sparse_adagrad(initial_accumulator=0.1)
    state = opt.init(num_rows, dim)
    dense_table = np.asarray(table).copy()
    dense_acc = np.full((num_rows, dim), 0.1, np.float32)
    lr = 0.1
    for step in range(5):
        ids = rng.integers(0, num_rows, size=8).astype(np.int32)
        grads = rng.normal(size=(8, dim)).astype(np.float32)
        uids, gsum, _ = dedup_segment_sum(jnp.asarray(ids), jnp.asarray(grads), num_rows)
        table, state = opt.apply(table, state, uids, gsum, jnp.asarray(step), lr)
        # dense reference: scatter-add grads into a full dense grad
        dg = np.zeros((num_rows, dim), np.float32)
        np.add.at(dg, ids, grads)
        dense_acc += dg * dg
        dense_table -= lr * dg / (np.sqrt(dense_acc) + 1e-8)
    np.testing.assert_allclose(np.asarray(table), dense_table, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state["acc"]), dense_acc, rtol=1e-5, atol=1e-6)


def test_sparse_adam_single_step_matches_dense_adam_on_touched_rows():
    num_rows, dim = 10, 3
    rng = np.random.default_rng(2)
    table0 = rng.normal(size=(num_rows, dim)).astype(np.float32)
    opt = sparse_adam(b1=0.9, b2=0.999, eps=1e-8)
    state = opt.init(num_rows, dim)
    ids = np.array([2, 5, 2], np.int32)
    grads = rng.normal(size=(3, dim)).astype(np.float32)
    uids, gsum, _ = dedup_segment_sum(jnp.asarray(ids), jnp.asarray(grads), num_rows)
    table, state = opt.apply(jnp.asarray(table0), state, uids, gsum, jnp.asarray(0), 0.01)
    # manual adam step on rows 2 and 5
    dg = np.zeros((num_rows, dim), np.float32)
    np.add.at(dg, ids, grads)
    for r in (2, 5):
        m = 0.1 * dg[r]
        v = 0.001 * dg[r] ** 2
        mh = m / (1 - 0.9)
        vh = v / (1 - 0.999)
        expected = table0[r] - 0.01 * mh / (np.sqrt(vh) + 1e-8)
        np.testing.assert_allclose(np.asarray(table)[r], expected, rtol=1e-5)
    # untouched rows unchanged
    np.testing.assert_array_equal(np.asarray(table)[0], table0[0])


def test_sentinel_never_corrupts_row_zero():
    """All-duplicate batch: padding segments must not touch any real row."""
    num_rows, dim = 6, 2
    table0 = jnp.ones((num_rows, dim), jnp.float32)
    opt = sparse_adam()
    state = opt.init(num_rows, dim)
    ids = jnp.full((8,), 4, jnp.int32)  # one unique id -> 7 padding segments
    grads = jnp.ones((8, dim), jnp.float32)
    uids, gsum, _ = dedup_segment_sum(ids, grads, num_rows)
    table, state = opt.apply(table0, state, uids, gsum, jnp.asarray(0), 0.1)
    t = np.asarray(table)
    np.testing.assert_array_equal(t[0], [1.0, 1.0])  # row 0 untouched
    assert not np.allclose(t[4], [1.0, 1.0])  # row 4 updated
    np.testing.assert_array_equal(np.asarray(state["m"])[0], [0.0, 0.0])


def test_dense_update_path_equals_sparse_path():
    """Auto-chosen dense Adagrad update == sorted-sparse update exactly."""
    from recmodels_tpu.embedding.optim import choose_dense_update

    num_rows, dim = 100, 4
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=(num_rows, dim)).astype(np.float32))
    opt = sparse_adagrad(initial_accumulator=0.1)
    s_sparse = opt.init(num_rows, dim)
    s_dense = opt.init(num_rows, dim)
    t_sparse, t_dense = table, table
    assert choose_dense_update(num_rows, dim, 32, True)
    for step in range(4):
        ids = jnp.asarray(rng.integers(0, num_rows, size=32).astype(np.int32))
        grads = jnp.asarray(rng.normal(size=(32, dim)).astype(np.float32))
        uids, gsum, _ = dedup_segment_sum(ids, grads, num_rows)
        t_sparse, s_sparse = opt.apply(t_sparse, s_sparse, uids, gsum, jnp.asarray(step), 0.05)
        t_dense, s_dense = opt.apply_dense(t_dense, s_dense, ids, grads, jnp.asarray(step), 0.05)
    np.testing.assert_allclose(np.asarray(t_sparse), np.asarray(t_dense), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_sparse["acc"]), np.asarray(s_dense["acc"]), rtol=1e-5, atol=1e-6
    )


def test_dense_adam_matches_manual():
    from recmodels_tpu.embedding.optim import dense_adam

    num_rows, dim = 20, 3
    rng = np.random.default_rng(6)
    table0 = rng.normal(size=(num_rows, dim)).astype(np.float32)
    opt = dense_adam()
    state = opt.init(num_rows, dim)
    ids = jnp.asarray(np.array([2, 5, 2], np.int32))
    grads = jnp.asarray(rng.normal(size=(3, dim)).astype(np.float32))
    table, state = opt.apply_dense(jnp.asarray(table0), state, ids, grads, jnp.asarray(0), 0.01)
    g = np.zeros((num_rows, dim), np.float32)
    np.add.at(g, np.asarray(ids), np.asarray(grads))
    m = 0.1 * g
    v = 0.001 * g * g
    expected = table0 - 0.01 * (m / (1 - 0.9)) / (np.sqrt(v / (1 - 0.999)) + 1e-8)
    np.testing.assert_allclose(np.asarray(table), expected, rtol=1e-5, atol=1e-6)
    # untouched rows DO move (zero grad, but bias-corrected zero -> zero delta)
    np.testing.assert_allclose(np.asarray(table)[0], expected[0], rtol=1e-6)


def test_fused_wide_column_equivalence():
    """Engine(fuse_wide=True) == Engine(fuse_wide=False) when weights are
    copied across: identical logits and identical post-step tables."""
    import jax.numpy as jnp
    from recmodels_tpu.data import SyntheticSource
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    sch = criteo_schema(vocab_size=300, embed_dim=8)
    model = build_model("fm", sch)
    e_f = Engine(model, emb_lr=5e-2, fuse_wide=True)
    e_u = Engine(model, emb_lr=5e-2, fuse_wide=False)
    assert e_f._fused_wide and not e_u._fused_wide
    s_f = e_f.init(jax.random.key(0))
    s_u = e_u.init(jax.random.key(1))
    # copy unfused weights into the fused layout
    emb_u = s_u.emb_params["emb"]["d8"]  # [R, 8]
    wide_u = s_u.emb_params["wide"]["d1"]  # [R]
    fused = jnp.concatenate([emb_u, wide_u[:, None]], axis=1)
    s_f = s_f._replace(emb_params={"emb": {"d9": fused}})

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.normal(size=(16, 13)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 300, size=(16, 26)).astype(np.int32))
    labels = jnp.asarray((rng.random(16) < 0.5).astype(np.float32))

    lg_f = e_f.logits(s_f, dense, ids)
    lg_u = e_u.logits(s_u, dense, ids)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_u), rtol=1e-5, atol=1e-6)

    s_f2, mf = e_f.jit_train_step(donate=False)(s_f, dense, ids, labels)
    s_u2, mu = e_u.jit_train_step(donate=False)(s_u, dense, ids, labels)
    np.testing.assert_allclose(float(mf["loss"]), float(mu["loss"]), rtol=1e-6)
    f2 = np.asarray(s_f2.emb_params["emb"]["d9"])
    np.testing.assert_allclose(
        f2[:, :8], np.asarray(s_u2.emb_params["emb"]["d8"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        f2[:, 8], np.asarray(s_u2.emb_params["wide"]["d1"]), rtol=1e-5, atol=1e-6
    )


def test_slot_sorted_ids_matches_flat_sort_exactly():
    """The batched per-slot sort must reproduce the flat b-major sort
    EXACTLY — same sorted stream, same permutation (including the order of
    duplicate ids, which fixes the update kernel's duplicate-sum order),
    and a correct inverse. Valid because build_groups assigns disjoint,
    column-order-increasing row ranges (asserted here via construction)."""
    import jax.lax

    from recmodels_tpu.embedding.optim import slot_sorted_ids, slot_sorted_inverse

    rng = np.random.default_rng(7)
    b, ns, vocab = 512, 26, 97  # small vocab -> plenty of duplicate ids
    ids = rng.integers(0, vocab, (b, ns)).astype(np.int32) + (
        np.arange(ns, dtype=np.int32) * vocab
    )[None, :]
    flat = ids.reshape(-1)
    iota = np.arange(flat.size, dtype=np.int32)
    s_ref, o_ref = jax.lax.sort_key_val(jnp.asarray(flat), jnp.asarray(iota))
    s_new, o_new, o2d = slot_sorted_ids(jnp.asarray(ids))
    inv = slot_sorted_inverse(o2d)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_new))
    np.testing.assert_array_equal(np.asarray(o_ref), np.asarray(o_new))
    np.testing.assert_array_equal(np.asarray(s_new)[np.asarray(inv)], flat)
