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
