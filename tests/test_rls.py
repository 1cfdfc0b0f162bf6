"""RLS refiner vs a direct float64 reimplementation of the reference's
whitened-ridge recipe (train_region_refiner.py semantics)."""

import numpy as np
import jax.numpy as jnp

from online_detection_tpu.solvers.rls import rls_fit, rls_predict


def reference_rls(x, y, lam):
    """Direct per-class solve following the reference recipe in f64."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    x1 = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    mu = y.mean(0)
    yc = y - mu
    s = yc.T @ yc / len(y)
    d, w = np.linalg.eig(s)
    d, w = d.real, w.real
    t = w @ np.diag(1 / np.sqrt(d + 0.001)) @ w.T
    t_inv = w @ np.diag(np.sqrt(d + 0.001)) @ w.T
    yw = yc @ t
    a = x1.T @ x1 + lam * np.eye(x1.shape[1])
    beta = np.linalg.solve(a, x1.T @ yw)
    return mu, t, t_inv, beta


def test_rls_matches_direct(rng):
    n, d, lam = 300, 16, 10.0
    x = rng.normal(size=(n, d)).astype(np.float32)
    true_w = rng.normal(size=(d, 4))
    y = (x @ true_w + 0.05 * rng.normal(size=(n, 4))).astype(np.float32)

    model = rls_fit(jnp.asarray(x)[None], jnp.asarray(y)[None], jnp.ones((1, n)), lam)
    mu, t, t_inv, beta = reference_rls(x, y, lam)

    np.testing.assert_allclose(np.asarray(model.mu[0]), mu, rtol=1e-4, atol=1e-4)
    # predictions must match (whitening basis may differ in sign/order)
    x1 = np.concatenate([x, np.ones((n, 1))], axis=1)
    want = x1 @ beta @ t_inv + mu
    got = np.asarray(rls_predict(model, jnp.asarray(x))[:, 0, :])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # and actually regress well
    np.testing.assert_allclose(got, y, atol=0.5)


def test_rls_masked_equals_dropped(rng):
    n, d = 200, 8
    x = rng.normal(size=(1, n, d)).astype(np.float32)
    y = rng.normal(size=(1, n, 4)).astype(np.float32)
    keep = rng.uniform(size=n) > 0.3
    w = keep.astype(np.float32)[None]
    m_masked = rls_fit(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), 1.0)
    m_dropped = rls_fit(
        jnp.asarray(x[:, keep]), jnp.asarray(y[:, keep]),
        jnp.ones((1, int(keep.sum()))), 1.0,
    )
    probe = jnp.asarray(rng.normal(size=(10, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rls_predict(m_masked, probe)),
        np.asarray(rls_predict(m_dropped, probe)),
        rtol=1e-3, atol=1e-3,
    )


def test_rls_empty_class(rng):
    x = rng.normal(size=(2, 50, 8)).astype(np.float32)
    y = rng.normal(size=(2, 50, 4)).astype(np.float32)
    w = np.ones((2, 50), np.float32)
    w[1] = 0.0  # class 1 has no samples
    model = rls_fit(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w), 1.0)
    assert bool(model.exists[0]) and not bool(model.exists[1])
    pred = np.asarray(rls_predict(model, jnp.asarray(x[0, :5])))
    np.testing.assert_allclose(pred[:, 1, :], 0.0)  # missing class -> 0 deltas


def test_rls_mean_losses_match(rng):
    n, d, lam = 100, 6, 5.0
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, 4)).astype(np.float32)
    model = rls_fit(jnp.asarray(x)[None], jnp.asarray(y)[None], jnp.ones((1, n)), lam)
    mu, t, t_inv, beta = reference_rls(x, y, lam)
    x1 = np.concatenate([x, np.ones((n, 1))], axis=1)
    yw = (y - mu) @ t
    want = (0.5 * (x1 @ beta - yw) ** 2).mean(0)
    np.testing.assert_allclose(np.asarray(model.mean_losses[0]), want, rtol=1e-2, atol=1e-3)
