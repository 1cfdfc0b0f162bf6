"""FALKON solver tests: PCG vs dense direct solve, masked rows, full-KRR
limit vs closed form, center selection semantics, class-batched vmap."""

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.solvers.falkon import (
    falkon_fit,
    falkon_fit_classes,
    falkon_predict,
    falkon_predict_classes,
    select_nystrom_centers,
    direct_nystrom_solve,
    FalkonModel,
)
from online_detection_tpu.ops.gaussian_mmv import gaussian_kernel


def _toy_problem(rng, n=200, d=8, m=32, sigma=2.0):
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = np.sign(x[:, 0] + 0.3 * rng.normal(size=n)).astype(np.float32)
    centers = x[rng.choice(n, m, replace=False)]
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(centers)


def test_pcg_matches_direct_solve(rng):
    x, y, c = _toy_problem(rng)
    w = jnp.ones(x.shape[0])
    lam = 1e-3
    alpha_cg = falkon_fit(x, y, w, c, 2.0, lam, maxiter=40)
    alpha_direct = direct_nystrom_solve(x, y, w, c, 2.0, lam)
    # compare in prediction space (the parametrization may differ in the
    # null space when K_MM is near-singular)
    k = gaussian_kernel(x, c, 2.0)
    np.testing.assert_allclose(
        np.asarray(k @ alpha_cg), np.asarray(k @ alpha_direct), rtol=1e-3, atol=1e-3
    )


def test_masked_rows_equal_dropped_rows(rng):
    x, y, c = _toy_problem(rng, n=150)
    keep = rng.uniform(size=150) > 0.4
    w = jnp.asarray(keep.astype(np.float32))
    a_masked = falkon_fit(x, y, w, c, 2.0, 1e-3, maxiter=30)
    a_dropped = falkon_fit(
        x[jnp.asarray(keep)], y[jnp.asarray(keep)],
        jnp.ones(int(keep.sum())), c, 2.0, 1e-3, maxiter=30,
    )
    k = gaussian_kernel(x, c, 2.0)
    np.testing.assert_allclose(
        np.asarray(k @ a_masked), np.asarray(k @ a_dropped), rtol=1e-3, atol=1e-3
    )


def test_full_krr_limit(rng):
    """With centers == all points, FALKON solves exact KRR:
    (K + lam*n*I) alpha = y."""
    n, d, sigma, lam = 60, 5, 1.5, 1e-2
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=n).astype(np.float32))
    alpha = falkon_fit(x, y, jnp.ones(n), x, sigma, lam, maxiter=60)
    k = np.asarray(gaussian_kernel(x, x, sigma), np.float64)
    alpha_closed = np.linalg.solve(k + lam * n * np.eye(n), np.asarray(y))
    np.testing.assert_allclose(
        k @ np.asarray(alpha, np.float64), k @ alpha_closed, rtol=2e-3, atol=2e-3
    )


def test_predictions_separate_classes(rng):
    x, y, c = _toy_problem(rng, n=400, m=64)
    alpha = falkon_fit(x, y, jnp.ones(400), c, 2.0, 1e-5, maxiter=20)
    model = FalkonModel(c, alpha, jnp.asarray(True), 2.0)
    scores = falkon_predict(model, x)
    acc = float(((scores > 0) == (y > 0)).mean())
    assert acc > 0.9, acc


def test_missing_model_scores_minus_two(rng):
    x, y, c = _toy_problem(rng)
    model = FalkonModel(c, jnp.zeros(c.shape[0]), jnp.asarray(False), 2.0)
    scores = falkon_predict(model, x)
    np.testing.assert_allclose(np.asarray(scores), -2.0)


def test_center_selection_semantics(rng):
    n, m = 100, 20
    is_pos = jnp.asarray(rng.uniform(size=n) < 0.3)
    valid = jnp.ones(n, bool)
    idx = select_nystrom_centers(jax.random.key(0), is_pos, valid, m)
    assert idx.shape == (m,)
    n_pos_sel = int(jnp.sum(is_pos[idx]))
    # at most m/2 positive slots
    assert n_pos_sel <= m // 2
    # only valid rows selected
    assert bool(valid[idx].all())

    # few positives: all of them selected, rest negatives
    is_pos2 = jnp.zeros(n, bool).at[:3].set(True)
    idx2 = select_nystrom_centers(jax.random.key(1), is_pos2, valid, m)
    sel_pos = set(np.asarray(idx2[np.asarray(is_pos2)[np.asarray(idx2)]]).tolist())
    assert sel_pos == {0, 1, 2}
    assert int((~is_pos2[idx2]).sum()) == m - 3

    # restricted validity
    valid3 = jnp.zeros(n, bool).at[:10].set(True)
    idx3 = select_nystrom_centers(jax.random.key(2), is_pos, valid3, m)
    assert bool((idx3 < 10).all())


def test_class_batched_fit(rng):
    """vmapped fit == per-class fits."""
    c_cls = 3
    xs, ys, cs = [], [], []
    for _ in range(c_cls):
        x, y, c = _toy_problem(rng, n=120, m=16)
        xs.append(x), ys.append(y), cs.append(c)
    xb = jnp.stack(xs); yb = jnp.stack(ys); cb = jnp.stack(cs)
    wb = jnp.ones((c_cls, 120))
    ab = falkon_fit_classes(xb, yb, wb, cb, 2.0, 1e-3, 20)
    for i in range(c_cls):
        ai = falkon_fit(xs[i], ys[i], wb[i], cs[i], 2.0, 1e-3, maxiter=20)
        np.testing.assert_allclose(np.asarray(ab[i]), np.asarray(ai), rtol=1e-4, atol=1e-5)

    models = FalkonModel(cb, ab, jnp.asarray([True, True, False]), 2.0)
    scores = falkon_predict_classes(models, xs[0])
    assert scores.shape == (120, c_cls)
    np.testing.assert_allclose(np.asarray(scores[:, 2]), -2.0)
