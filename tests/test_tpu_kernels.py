"""On-chip kernel parity lane (SURVEY.md §4 item 1; VERDICT r1 item 5):
every Pallas kernel COMPILED on the attached TPU vs its jnp reference.
Interpret-mode tests (test_pallas_*.py) cover semantics on CPU; this lane
guards the Mosaic lowering itself — layouts, DMA alignment, MXU precision.

Run: ``RECMODELS_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -m tpu``
(driver-runnable; compiles are cached in .jax_cache).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU attached")


def test_sweep_gather_compiled_exact():
    from recmodels_tpu.embedding import pallas_gather

    rng = np.random.default_rng(0)
    rows, d, n = 512 * 64, 17, 40_000
    table = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    packed = jax.jit(pallas_gather.pack)(table)
    ids = np.sort(rng.integers(0, rows, size=n)).astype(np.int32)
    out = jax.jit(pallas_gather.sorted_gather)(packed, jnp.asarray(ids))[:, :d]
    ref = table[ids].astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_packed_update_compiled_matches_sparse_adagrad():
    from recmodels_tpu.embedding import pallas_gather, pallas_update
    from recmodels_tpu.embedding.optim import dedup_segment_sum, sparse_adagrad

    rng = np.random.default_rng(1)
    rows, d, n = 512 * 16, 16, 5000
    table = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    acc = jnp.asarray((np.abs(rng.normal(size=(rows, d))) + 0.1).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, size=(n,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)

    tp, ap = jax.jit(
        lambda t, a: pallas_update.sorted_adagrad_update_packed(
            t, a, uids, gsum, 0.05, 1e-8
        )
    )(pallas_gather.pack(table), pallas_gather.pack(acc))
    t_ref, st = sparse_adagrad().apply(
        table, {"acc": acc}, uids, gsum, jnp.asarray(0), 0.05
    )
    np.testing.assert_allclose(
        np.asarray(pallas_gather.unpack(tp, d)), np.asarray(t_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pallas_gather.unpack(ap, d)), np.asarray(st["acc"]), rtol=3e-4, atol=1e-5
    )


def test_update_2d_compiled_matches_sparse_adagrad():
    from recmodels_tpu.embedding import pallas_update
    from recmodels_tpu.embedding.optim import dedup_segment_sum, sparse_adagrad

    rng = np.random.default_rng(2)
    rows, d, n = 512 * 8, 16, 3000
    table = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    acc = jnp.asarray((np.abs(rng.normal(size=(rows, d))) + 0.1).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, size=(n,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    tk, ak = jax.jit(
        lambda t, a: pallas_update.sorted_adagrad_update(t, a, uids, gsum, 0.05, 1e-8)
    )(table, acc)
    t_ref, st = sparse_adagrad().apply(
        table, {"acc": acc}, uids, gsum, jnp.asarray(0), 0.05
    )
    np.testing.assert_allclose(np.asarray(tk), np.asarray(t_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ak), np.asarray(st["acc"]), rtol=3e-4, atol=1e-5)


def test_cin_kernel_compiled_matches_reference():
    # f32 compat path: pin matmul precision to HIGHEST on both sides — the
    # platform's DEFAULT f32 matmul precision drifted to bf16 between
    # rounds 3 and 4, which made kernel and einsum reference disagree at
    # bf16 scale even though each was internally self-consistent.
    from recmodels_tpu.ops import interactions as ref_ops
    from recmodels_tpu.ops.pallas import interactions_tpu as ktu

    rng = np.random.default_rng(3)
    b, m, d, hk, hn = 512, 26, 16, 32, 128
    xk = jnp.asarray(rng.normal(size=(b, hk, d)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(hn, hk, m)).astype(np.float32) * 0.1)
    with jax.default_matmul_precision("highest"):
        out = jax.jit(ktu.cin_layer)(xk, x0, w)
        ref = jax.jit(ref_ops.cin_layer)(xk, x0, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_split_fused_rows_compiled_matches_reference():
    from recmodels_tpu.ops.pallas import interactions_tpu as ktu

    rng = np.random.default_rng(4)
    b, m, d = 512, 26, 16
    full = jnp.asarray(rng.normal(size=(b, m, d + 1)).astype(np.float32)).astype(jnp.bfloat16)
    x_dm, ws = jax.jit(lambda x: ktu.split_fused_rows(x, d))(full)
    np.testing.assert_array_equal(
        np.asarray(x_dm), np.asarray(jnp.swapaxes(full[..., :d], 1, 2))
    )
    np.testing.assert_allclose(
        np.asarray(ws),
        np.asarray(jnp.sum(full[..., d].astype(jnp.float32), axis=1)),
        rtol=1e-6,
    )


def test_engine_bf16_train_step_compiled_loss_finite():
    """One full flagship-path train step (packed master, sweep gather,
    packed update, CIN kernels) compiled on-chip: loss finite, tables sane."""
    from recmodels_tpu.data.schema import criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.train.engine import Engine

    schema = criteo_schema(vocab_size=2000, embed_dim=16)
    model = build_model("xdeepfm", schema, cin_sizes=(128, 128), hidden=(64, 64),
                        compute_dtype=jnp.bfloat16)
    eng = Engine(model=model, sparse_optimizer="adagrad")
    state = eng.init(jax.random.key(0))
    assert state.emb_params["emb"]["d17"].ndim == 3  # packed master in play
    rng = np.random.default_rng(5)
    b = 1024
    dense = jnp.asarray(rng.normal(size=(b, schema.n_dense)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 2000, size=(b, schema.n_slots)).astype(np.int32))
    labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.float32))
    step = eng.jit_train_step()
    state, m = step(state, dense, ids, labels)
    assert np.isfinite(float(m["loss"]))


def test_cin_bwd_kernel_compiled_matches_einsums(monkeypatch):
    """The opt-in fused CIN backward compiled on-chip vs einsum cotangents
    (flat kernel-native weights)."""
    from recmodels_tpu.ops import interactions as ref_ops
    from recmodels_tpu.ops.pallas import interactions_tpu as ktu

    rng = np.random.default_rng(6)
    rows, hk, m, hn = 512 * 8, 128, 26, 128
    xk2 = jnp.asarray(rng.normal(size=(rows, hk)).astype(np.float32)).astype(jnp.bfloat16)
    x02 = jnp.asarray(rng.normal(size=(rows, m)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(hn, hk, m)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(rows, hn)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = ref_ops.flatten_cin_w(w)

    gxk, gx0, gw2 = jax.jit(ktu._cin_bwd_pallas)(xk2, x02, w2, g)
    want_xk = jnp.einsum("rn,nhi,ri->rh", g, w, x02)
    want_x0 = jnp.einsum("rn,nhi,rh->ri", g, w, xk2)
    want_w2 = ref_ops.flatten_cin_w(jnp.einsum("rn,rh,ri->nhi", g, xk2, x02))
    for a, b in ((gxk, want_xk), (gx0, want_x0), (gw2, want_w2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) <= 0.01 * np.max(np.abs(b)) + 1e-3


def test_serve_roundtrip_on_tpu(tmp_path):
    """Export from a TPU-trained (packed-master) state, reload, and score:
    canonicalize -> re-pack must reproduce the engine's own logits."""
    from recmodels_tpu.data import SyntheticSource
    from recmodels_tpu.data.schema import criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.serve import export_model, load_predictor
    from recmodels_tpu.train.engine import Engine
    from recmodels_tpu.utils.config import TrainConfig

    cfg = TrainConfig(model="deepfm", vocab_size=2000, embed_dim=16,
                      hidden=(64,), bf16=True)
    schema = criteo_schema(vocab_size=2000, embed_dim=16)
    model = build_model("deepfm", schema, **cfg.model_kwargs())
    eng = Engine(model)
    state = eng.init(jax.random.key(0))
    src = iter(SyntheticSource(schema, batch_size=512, seed=1))
    ts = eng.jit_train_step()
    for _ in range(5):
        b = next(src)
        state, _ = ts(state, jnp.asarray(b.dense), jnp.asarray(b.ids),
                      jnp.asarray(b.labels))
    out = str(tmp_path / "artifact")
    export_model(out, cfg, eng, jax.device_get(state))
    pred = load_predictor(out, min_bucket=512)
    b = next(src)
    want = np.asarray(jax.jit(eng.logits)(state, jnp.asarray(b.dense), jnp.asarray(b.ids)))
    got = pred.predict_logits(b.dense, b.ids)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cin2_fused_stack_compiled_matches_composed(monkeypatch):
    """The fused 2-layer CIN stack (pair-first L1, round 4) compiled
    on-chip: pools AND all three cotangents vs the composed per-layer
    kernel path (gate forced off)."""
    from recmodels_tpu.ops.pallas import interactions_tpu as ktu

    rng = np.random.default_rng(7)
    b, d, m, h1, h2 = 512, 16, 26, 128, 128
    x_dm = jnp.asarray(rng.normal(size=(b, d, m)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.normal(size=(m, m * h1)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray((rng.normal(size=(h1, m * h2)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(rng.normal(size=(b, h1 + h2)).astype(np.float32))

    def loss(x, wa, wb):
        p = ktu.cin_stack_dm_flat(x, [wa, wb])
        return jnp.sum(p.astype(jnp.float32) * c)

    def loss_f32(x, wa, wb):
        # f32 einsum oracle of the same math (pool(L1), pool(L2))
        x2d = x.reshape(b * d, m).astype(jnp.float32)
        w3a = wa.astype(jnp.float32).reshape(m, m, h1)
        x1 = jnp.einsum("rh,hin,ri->rn", x2d, w3a, x2d)
        w3b = wb.astype(jnp.float32).reshape(h1, m, h2)
        x2 = jnp.einsum("rh,hin,ri->rn", x1, w3b, x2d)
        p = jnp.concatenate(
            [jnp.sum(x1.reshape(b, d, h1), axis=1),
             jnp.sum(x2.reshape(b, d, h2), axis=1)], axis=1)
        return jnp.sum(p * c)

    assert ktu._cin2_supported(x_dm.reshape(b * d, m), [w1, w2], d)
    got = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(x_dm, w1, w2)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(jax.value_and_grad(loss_f32, argnums=(0, 1, 2)))(x_dm, w1, w2)
    # composed per-layer kernel path, same bf16 regime, as a second oracle
    monkeypatch.setattr(ktu, "_cin2_supported", lambda *a: False)
    comp = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(x_dm, w1, w2)

    def close(a, bb, tol):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        assert np.max(np.abs(a - bb)) <= tol * np.max(np.abs(bb)) + 1e-3

    # fused must sit within bf16 distance of the f32 oracle, and no farther
    # from it than ~the composed path is (same-regime sanity)
    close(got[0], want[0], 0.03)
    for ga, gb in zip(got[1], want[1]):
        close(ga, gb, 0.03)
    close(comp[0], want[0], 0.03)
    for ga, gb in zip(comp[1], want[1]):
        close(ga, gb, 0.03)


def test_packed_adam_kernel_compiled_matches_oracle():
    """The packed lazy-Adam sweep kernel compiled on-chip vs the
    dedup + sparse_adam oracle (duplicates included)."""
    from recmodels_tpu.embedding import pallas_gather, pallas_update
    from recmodels_tpu.embedding.optim import dedup_segment_sum, sparse_adam

    rng = np.random.default_rng(11)
    rows, dim, n = 1024 * 16, 17, 9_000
    table = jnp.asarray(rng.normal(size=(rows, dim)).astype(np.float32))
    m = jnp.asarray((rng.normal(size=(rows, dim)) * 0.01).astype(np.float32))
    v = jnp.asarray((np.abs(rng.normal(size=(rows, dim))) * 0.01).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, rows, size=(n,)).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    lr, step, b1, b2, eps = 0.05, 4, 0.9, 0.999, 1e-8

    uids, gsum, _ = dedup_segment_sum(ids, grads, rows)
    t_r, st_r = sparse_adam(b1=b1, b2=b2, eps=eps).apply(
        table, {"m": m, "v": v}, uids, gsum, jnp.asarray(step), lr)

    order = jnp.argsort(ids)
    t_k, m_k, v_k = jax.jit(
        lambda *a: pallas_update.sorted_adam_update_packed(
            *a, lr, jnp.asarray(step), b1, b2, eps)
    )(pallas_gather.pack(table), pallas_gather.pack(m), pallas_gather.pack(v),
      ids[order], jnp.take(grads, order, axis=0))
    # compiled-path tolerance matches the Adagrad compiled test: the f32
    # 3-part split reconstructs each unique grad exactly, but duplicate-sum
    # order + FMA contraction differ from the XLA oracle by ~1 ulp per op
    for got, want in ((t_k, t_r), (m_k, st_r["m"]), (v_k, st_r["v"])):
        got2 = np.asarray(pallas_gather.unpack(got, dim))
        np.testing.assert_allclose(got2, np.asarray(want), rtol=1e-4, atol=1e-5)
