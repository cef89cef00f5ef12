"""Pallas kernel parity vs jnp references — forward AND grad
(SURVEY.md §4 item 1). Runs in interpret mode on CPU; the same kernels
compile on TPU (exercised by bench/ and the TPU smoke script)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recmodels_tpu.ops import interactions as ref
from recmodels_tpu.ops.pallas import interactions_tpu as ker


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(ker, "_INTERPRET", True)


def rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_fm_pairwise_forward_and_grad():
    e = rand(512, 26, 16, seed=0)
    got = ker.fm_pairwise(e)
    want = ref.fm_pairwise(e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    g1 = jax.grad(lambda x: jnp.sum(ker.fm_pairwise(x) ** 2))(e)
    g2 = jax.grad(lambda x: jnp.sum(ref.fm_pairwise(x) ** 2))(e)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3)


def test_fm_pairwise_ragged_batch_falls_back():
    e = rand(97, 26, 16, seed=1)  # 97 not divisible by tile
    np.testing.assert_allclose(
        np.asarray(ker.fm_pairwise(e)), np.asarray(ref.fm_pairwise(e)), rtol=1e-4, atol=1e-4
    )


def test_dcn_cross_stack_forward_and_grad():
    b, d, L = 256, 128, 3
    x0, w, bb = rand(b, d, seed=2), rand(L, d, seed=3) * 0.1, rand(L, d, seed=4) * 0.1
    got = ker.dcn_cross_stack(x0, w, bb)
    want = ref.dcn_cross_stack(x0, w, bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def loss_k(x0, w, bb):
        return jnp.sum(ker.dcn_cross_stack(x0, w, bb) ** 2)

    def loss_r(x0, w, bb):
        return jnp.sum(ref.dcn_cross_stack(x0, w, bb) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x0, w, bb)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x0, w, bb)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-3)


def test_cin_layer_forward_and_grad():
    b, hk, m, d, hn = 16, 12, 26, 16, 20
    xk, x0, w = rand(b, hk, d, seed=5), rand(b, m, d, seed=6), rand(hn, hk, m, seed=7) * 0.1
    got = ker.cin_layer(xk, x0, w)
    want = ref.cin_layer(xk, x0, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)

    gk = jax.grad(lambda a, b_, c: jnp.sum(ker.cin_layer(a, b_, c) ** 2), argnums=(0, 1, 2))(
        xk, x0, w
    )
    gr = jax.grad(lambda a, b_, c: jnp.sum(ref.cin_layer(a, b_, c) ** 2), argnums=(0, 1, 2))(
        xk, x0, w
    )
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-3)


def test_cin_stack_matches_reference():
    b, m, d = 16, 26, 16
    x0 = rand(b, m, d, seed=8)
    ws = [rand(24, 26, 26, seed=9) * 0.1, rand(16, 24, 26, seed=10) * 0.1]
    got = ker.cin_stack(x0, ws)
    want = ref.cin_stack(x0, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)

    gk = jax.grad(lambda x: jnp.sum(ker.cin_stack(x, ws) ** 2))(x0)
    gr = jax.grad(lambda x: jnp.sum(ref.cin_stack(x, ws) ** 2))(x0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=1e-3, atol=1e-3)


def test_models_agree_reference_vs_kernel_dispatch():
    """xDeepFM/DCN logits identical whichever dispatch path is taken."""
    from recmodels_tpu.data import criteo_schema
    from recmodels_tpu.models import build_model
    from recmodels_tpu.ops import dispatch
    from recmodels_tpu.train.engine import Engine

    sch = criteo_schema(vocab_size=100, embed_dim=8)
    for name, kw in (("xdeepfm", {"cin_sizes": (8, 8), "hidden": (16,)}),
                     ("dcn", {"n_cross": 2, "hidden": (16,)})):
        model = build_model(name, sch, **kw)
        eng = Engine(model)
        state = eng.init(jax.random.key(0))
        rng = np.random.default_rng(0)
        dense = jnp.asarray(rng.normal(size=(8, 13)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 100, size=(8, 26)).astype(np.int32))
        with dispatch.use_reference():
            want = eng.logits(state, dense, ids)
        # force the kernel path even on CPU (interpret mode via fixture)
        dispatch._PALLAS.update(ker.KERNELS)
        dispatch._PALLAS.update(ker.FUSED)
        prev = dispatch._pallas_enabled
        dispatch._pallas_enabled = lambda: True
        try:
            got = eng.logits(state, dense, ids)
        finally:
            dispatch._pallas_enabled = prev
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_cin_bwd_pallas_matches_einsums():
    """The fused Pallas CIN backward (aligned bf16 layers, FLAT kernel-native
    weights) vs the einsum reference cotangents — all three of gxk / gx0 /
    gw, duplicate of the exact dispatch condition in
    interactions_tpu._cin_2d_bwd."""
    rows, hk, m, hn = 512, 128, 26, 128
    r = np.random.default_rng(11)
    xk2 = jnp.asarray(r.normal(size=(rows, hk)).astype(np.float32)).astype(jnp.bfloat16)
    x02 = jnp.asarray(r.normal(size=(rows, m)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((r.normal(size=(hn, hk, m)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    g = jnp.asarray(r.normal(size=(rows, hn)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = ref.flatten_cin_w(w)

    got = ker._cin_bwd_pallas(xk2, x02, w2, g)
    want = (
        jnp.einsum("rn,nhi,ri->rh", g, w, x02),
        jnp.einsum("rn,nhi,rh->ri", g, w, xk2),
        ref.flatten_cin_w(jnp.einsum("rn,rh,ri->nhi", g, xk2, x02)),
    )
    for a, b in zip(got, want):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.05, atol=0.3,  # bf16 summation-order differences
        )


def test_cin_bwd_dispatch_condition_via_grad(monkeypatch):
    """jax.grad through _cin_layer_2d (flat weights) hits the Pallas
    backward on aligned bf16 shapes (the default since round 3) and agrees
    with the einsum path end to end."""
    monkeypatch.delenv("RECMODELS_CIN_BWD_EINSUM", raising=False)
    rows, hk, m, hn = 512, 128, 26, 128
    r = np.random.default_rng(12)
    xk2 = jnp.asarray(r.normal(size=(rows, hk)).astype(np.float32)).astype(jnp.bfloat16)
    x02 = jnp.asarray(r.normal(size=(rows, m)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((r.normal(size=(hn, hk, m)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    w2 = ref.flatten_cin_w(w)

    def loss(a, b, c):
        return jnp.sum(ker._cin_layer_2d(a, b, c).astype(jnp.float32) ** 2)

    gk = jax.grad(loss, argnums=(0, 1, 2))(xk2, x02, w2)

    def loss_ref(a, b, c2):
        c3 = c2.reshape(hk, m, hn)
        t = jnp.einsum("rh,hin->rin", a, c3, preferred_element_type=jnp.float32)
        out = jnp.einsum("rin,ri->rn", t, b.astype(t.dtype)).astype(a.dtype)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xk2, x02, w2)
    for a, b in zip(gk, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 summation-order differences: bound the error by the
        # cotangent's overall scale, not elementwise (tiny elements of a
        # large-magnitude grad legitimately differ by bf16 ulps of the sum)
        assert np.max(np.abs(a - b)) <= 0.01 * np.max(np.abs(b)) + 1e-3
