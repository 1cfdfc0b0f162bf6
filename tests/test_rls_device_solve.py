"""Device-solve RLS path vs host-f64 path."""

import numpy as np
import jax.numpy as jnp

from online_detection_tpu.solvers.rls import rls_fit_grouped, rls_predict


def test_device_solve_matches_host(rng):
    n, d, c, lam = 300, 12, 2, 100.0
    x = rng.normal(size=(n, d)).astype(np.float32)
    wtrue = rng.normal(size=(d, 4)) * 0.1
    y = (x @ wtrue + 0.05 * rng.normal(size=(n, 4))).astype(np.float32)
    cls1 = rng.integers(1, c + 1, n).astype(np.float32)
    w = np.ones(n, np.float32)
    host = rls_fit_grouped(jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1),
                           jnp.asarray(w), c, lam, device_solve=False)
    dev = rls_fit_grouped(jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1),
                          jnp.asarray(w), c, lam, device_solve=True)
    probe = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rls_predict(dev, probe)),
        np.asarray(rls_predict(host, probe)),
        rtol=5e-3, atol=5e-3,
    )
    assert dev.exists.tolist() == host.exists.tolist()
    # device-solve mean losses are REAL now (the reference prints them,
    # train_region_refiner.py:80-84), matching the host-f64 path
    np.testing.assert_allclose(
        np.asarray(dev.mean_losses), np.asarray(host.mean_losses),
        rtol=5e-2, atol=1e-4,
    )
    assert float(np.asarray(dev.mean_losses).max()) > 0


def test_device_solve_underdetermined_small_lambda(rng):
    """The flagship smoke regime: n << d with a small ridge (the RPN refiner
    runs lam=0.01 on ~5 samples at d=1025). Plain f32 Cholesky NaN'd here on
    TPU (bf16-pass Gram noise made G + lam I indefinite), which silently
    zeroed every proposal at inference; the equilibrated escalating-jitter
    solve must stay finite and close to the host-f64 solution."""
    n, d, c, lam = 5, 64, 3, 0.01
    x = rng.normal(size=(n, d)).astype(np.float32) * 3.0
    y = rng.normal(size=(n, 4)).astype(np.float32)
    cls1 = np.asarray([1, 1, 2, 2, 2], np.float32)
    w = np.ones(n, np.float32)
    host = rls_fit_grouped(jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1),
                           jnp.asarray(w), c, lam, device_solve=False)
    dev = rls_fit_grouped(jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1),
                          jnp.asarray(w), c, lam, device_solve=True)
    assert np.isfinite(np.asarray(dev.beta)).all()
    probe = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rls_predict(dev, probe)),
        np.asarray(rls_predict(host, probe)),
        rtol=2e-2, atol=2e-2,
    )


def test_device_solve_survives_indefinite_gram(rng):
    """Feed _device_solve_from_stats a Gram perturbed past PSD (the TPU
    bf16-pass failure mode, reproduced deterministically): the escalating
    jitter must still return finite coefficients whose residual is small."""
    from online_detection_tpu.solvers.rls import _device_solve_from_stats

    d, lam = 32, 0.01
    x = rng.normal(size=(6, d)).astype(np.float32)
    g_xx = x.T @ x
    # rank-deficient PSD + a perturbation that drives one eigenvalue to -0.1
    evals, evecs = np.linalg.eigh(g_xx)
    g_xx = g_xx - (evals[0] + 0.1) * np.outer(evecs[:, 0], evecs[:, 0])
    g = np.zeros((1, d + 1, d + 1), np.float32)
    g[0, :d, :d] = g_xx
    sx = x.sum(0)
    g[0, :d, d] = sx
    g[0, d, :d] = sx
    g[0, d, d] = 6.0
    y = rng.normal(size=(6, 4)).astype(np.float32)
    b = np.concatenate([x.T @ y, y.sum(0, keepdims=True)], 0)[None]
    beta, t_dev, t_inv, mu, exists, losses = _device_solve_from_stats(
        jnp.asarray(g), jnp.asarray(b), jnp.asarray(y.sum(0)[None]),
        jnp.asarray((y.T @ y)[None]), jnp.asarray([6.0]),
        jnp.asarray(lam, jnp.float32),
    )
    assert bool(exists[0])
    assert np.isfinite(np.asarray(beta)).all()
    assert np.isfinite(np.asarray(losses)).all()


def test_block_compaction_matches_masked_path(rng):
    """The per-class block fast path is a row permutation of the masked pass:
    identical moments, same model (up to reduction-order epsilon)."""
    import numpy as np
    import jax.numpy as jnp
    from online_detection_tpu.solvers import rls as R

    n, d, c = 600, 24, 5
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    cls1 = jnp.asarray(rng.integers(1, c + 1, size=(n,)).astype(np.float32))
    w = jnp.asarray((rng.random(n) > 0.2).astype(np.float32))

    fast = R.rls_fit_grouped(x, y, cls1, w, c, 10.0, device_solve=True)
    # force the masked fallback by shrinking the block budget
    orig = R._BLOCK_BYTES_LIMIT
    R._BLOCK_BYTES_LIMIT = 0
    try:
        slow = R.rls_fit_grouped(x, y, cls1, w, c, 10.0, device_solve=True)
    finally:
        R._BLOCK_BYTES_LIMIT = orig

    np.testing.assert_array_equal(np.asarray(fast.exists), np.asarray(slow.exists))
    np.testing.assert_allclose(np.asarray(fast.mu), np.asarray(slow.mu), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast.beta), np.asarray(slow.beta),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fast.mean_losses),
                               np.asarray(slow.mean_losses), rtol=2e-3, atol=2e-4)
