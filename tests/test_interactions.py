"""Interaction-op reference tests: math vs brute force + torch cross-checks
(SURVEY.md §4 item 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recmodels_tpu.ops import interactions as I


@pytest.fixture
def emb():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(5, 7, 6)).astype(np.float32))


def test_fm_pairwise_matches_bruteforce(emb):
    e = np.asarray(emb)
    brute = np.zeros(e.shape[0], np.float32)
    f = e.shape[1]
    for i in range(f):
        for j in range(i + 1, f):
            brute += (e[:, i, :] * e[:, j, :]).sum(-1)
    got = np.asarray(I.fm_pairwise(emb))
    np.testing.assert_allclose(got, brute, rtol=1e-5, atol=1e-5)


def test_pnn_inner_matches_bruteforce(emb):
    e = np.asarray(emb)
    f = e.shape[1]
    cols = []
    for i in range(f):
        for j in range(i + 1, f):
            cols.append((e[:, i, :] * e[:, j, :]).sum(-1))
    brute = np.stack(cols, axis=1)
    got = np.asarray(I.pnn_inner_products(emb))
    np.testing.assert_allclose(got, brute, rtol=1e-5, atol=1e-5)


def test_pnn_outer_superposition(emb):
    e = np.asarray(emb)
    s = e.sum(1)
    brute = s[:, :, None] * s[:, None, :]
    got = np.asarray(I.pnn_outer_product(emb))
    np.testing.assert_allclose(got, brute, rtol=1e-5, atol=1e-5)


def test_dcn_cross_layer():
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    xl = jnp.asarray(rng.normal(size=(4, 9)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(9,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(9,)).astype(np.float32))
    got = np.asarray(I.dcn_cross_layer(x0, xl, w, b))
    brute = np.asarray(x0) * (np.asarray(xl) @ np.asarray(w))[:, None] + np.asarray(b) + np.asarray(xl)
    np.testing.assert_allclose(got, brute, rtol=1e-5, atol=1e-5)


def test_cin_layer_matches_explicit_hadamard():
    rng = np.random.default_rng(2)
    b, h, m, d, hn = 3, 5, 4, 6, 7
    xk = rng.normal(size=(b, h, d)).astype(np.float32)
    x0 = rng.normal(size=(b, m, d)).astype(np.float32)
    w = rng.normal(size=(hn, h, m)).astype(np.float32)
    # explicit: z[b,h,m,d] = xk[b,h,d]*x0[b,m,d]; out[b,n,d] = sum_{h,m} w[n,h,m] z
    z = xk[:, :, None, :] * x0[:, None, :, :]
    brute = np.einsum("bhmd,nhm->bnd", z, w)
    got = np.asarray(I.cin_layer(jnp.asarray(xk), jnp.asarray(x0), jnp.asarray(w)))
    np.testing.assert_allclose(got, brute, rtol=1e-4, atol=1e-4)


def test_fm_pairwise_grads_finite_difference(emb):
    f = lambda e: jnp.sum(I.fm_pairwise(e))
    g = jax.grad(f)(emb)
    eps = 1e-3
    e0 = np.asarray(emb).copy()
    idx = (1, 2, 3)
    ep = e0.copy(); ep[idx] += eps
    em = e0.copy(); em[idx] -= eps
    fd = (float(f(jnp.asarray(ep))) - float(f(jnp.asarray(em)))) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-2)


def test_cin_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    b, h, m, d, hn = 2, 4, 5, 8, 6
    xk = rng.normal(size=(b, h, d)).astype(np.float32)
    x0 = rng.normal(size=(b, m, d)).astype(np.float32)
    w = rng.normal(size=(hn, h, m)).astype(np.float32)
    txk, tx0, tw = map(torch.tensor, (xk, x0, w))
    # torch reference: einsum over the Hadamard tensor
    tz = txk[:, :, None, :] * tx0[:, None, :, :]
    tout = torch.einsum("bhmd,nhm->bnd", tz, tw)
    got = np.asarray(I.cin_layer(jnp.asarray(xk), jnp.asarray(x0), jnp.asarray(w)))
    np.testing.assert_allclose(got, tout.numpy(), rtol=1e-4, atol=1e-4)


def test_fm_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    e = rng.normal(size=(6, 26, 16)).astype(np.float32)
    te = torch.tensor(e)
    s = te.sum(1)
    tout = 0.5 * ((s * s).sum(1) - (te * te).sum(dim=(1, 2)))
    got = np.asarray(I.fm_pairwise(jnp.asarray(e)))
    np.testing.assert_allclose(got, tout.numpy(), rtol=1e-4, atol=1e-4)


def test_afm_pair_products_matches_triu_indexing():
    """ADVICE r3 #3: the static-slice construction must equal the
    fancy-indexing form with np.triu pair order."""
    import numpy as np
    import jax.numpy as jnp
    from recmodels_tpu.ops import interactions as ops

    rng = np.random.default_rng(0)
    b, f, d = 8, 7, 5
    emb = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    fi, fj = np.triu_indices(f, k=1)
    want = np.asarray(emb)[:, fi, :] * np.asarray(emb)[:, fj, :]
    got = np.asarray(ops.afm_pair_products(emb))
    np.testing.assert_array_equal(got, want)
