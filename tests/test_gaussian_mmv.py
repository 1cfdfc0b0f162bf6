"""Gaussian-kernel mmv: XLA path vs NumPy, Pallas path (interpret mode on
CPU) vs XLA path."""

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.ops.gaussian_mmv import (
    gaussian_kernel,
    mmv_xla,
    mmv_pallas,
)


def np_kernel(x, c, sigma):
    sq = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    return np.exp(-sq / (2 * sigma**2))


def test_kernel_matches_numpy(rng):
    x = rng.normal(size=(33, 17)).astype(np.float32)
    c = rng.normal(size=(9, 17)).astype(np.float32)
    got = np.asarray(gaussian_kernel(jnp.asarray(x), jnp.asarray(c), 2.5))
    np.testing.assert_allclose(got, np_kernel(x, c, 2.5), rtol=1e-4, atol=1e-5)


def test_mmv_xla(rng):
    x = rng.normal(size=(50, 32)).astype(np.float32)
    c = rng.normal(size=(20, 32)).astype(np.float32)
    v = rng.normal(size=(20, 3)).astype(np.float32)
    got = np.asarray(mmv_xla(jnp.asarray(x), jnp.asarray(c), jnp.asarray(v), 1.7))
    want = np_kernel(x, c, 1.7) @ v
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # 1-D v
    got1 = np.asarray(mmv_xla(jnp.asarray(x), jnp.asarray(c), jnp.asarray(v[:, 0]), 1.7))
    np.testing.assert_allclose(got1, want[:, 0], rtol=1e-4, atol=1e-4)


def test_mmv_pallas_interpret_matches_xla(rng):
    """Pallas kernel correctness via CPU interpret mode (ragged, padded
    shapes on purpose: N, M, d, t all non-multiples of the tiles).
    ``bf16_dot=False`` isolates the tiling/masking logic at full precision."""
    x = rng.normal(size=(300, 70)).astype(np.float32)
    c = rng.normal(size=(130, 70)).astype(np.float32)
    v = rng.normal(size=(130, 5)).astype(np.float32)
    got = np.asarray(
        mmv_pallas(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(v), 3.0,
            tile_n=128, tile_m=128, interpret=True, bf16_dot=False,
        )
    )
    want = np.asarray(mmv_xla(jnp.asarray(x), jnp.asarray(c), jnp.asarray(v), 3.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mmv_pallas_bf16_dot_tolerance(rng):
    """The default single-pass bf16 MXU dot stays within ~1e-2 of the f32
    result at realistic scales (z-scored features, sigma in the config
    range) — the accuracy contract for the inference scoring path."""
    x = rng.normal(size=(300, 256)).astype(np.float32)
    c = rng.normal(size=(130, 256)).astype(np.float32)
    v = rng.normal(size=(130, 5)).astype(np.float32)
    got = np.asarray(
        mmv_pallas(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(v), 10.0,
            tile_n=128, tile_m=128, interpret=True,
        )
    )
    want = np.asarray(mmv_xla(jnp.asarray(x), jnp.asarray(c), jnp.asarray(v), 10.0))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-2 * scale)
