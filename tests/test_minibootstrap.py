"""Minibootstrap trainer behavior tests on synthetic separable data."""

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.solvers.falkon import falkon_predict
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)


def make_class_problem(rng, n_cls=2, p=40, n_iter=3, batch=64, d=6):
    """Gaussian blobs: positives at +2*e_c per class, negatives mixed."""
    pos = np.stack(
        [rng.normal(size=(p, d)).astype(np.float32) + 2.0 * np.eye(d)[c] for c in range(n_cls)]
    )
    neg = np.stack(
        [rng.normal(size=(n_iter, batch, d)).astype(np.float32) - 2.0 * np.eye(d)[c]
         for c in range(n_cls)]
    )
    return jnp.asarray(pos), jnp.asarray(neg)


def test_minibootstrap_trains_separating_classifiers(rng):
    pos, neg = make_class_problem(rng)
    c, p = pos.shape[:2]
    n_iter, batch = neg.shape[1], neg.shape[2]
    params = MinibootstrapParams(m=32, sigma=3.0, lam=1e-5)
    models = train_classifiers_minibootstrap(
        jax.random.key(0),
        pos, jnp.ones((c, p), bool),
        neg, jnp.ones((c, n_iter, batch), bool),
        params,
    )
    assert models.alpha.shape == (c, 32)
    assert bool(models.exists.all())
    for ci in range(c):
        m_i = jax.tree.map(lambda a: a[ci] if hasattr(a, "shape") and a.ndim else a, models)
        s_pos = falkon_predict(m_i, pos[ci])
        s_neg = falkon_predict(m_i, neg[ci].reshape(-1, pos.shape[-1]))
        acc = float((s_pos > 0).mean()) * 0.5 + float((s_neg < 0).mean()) * 0.5
        assert acc > 0.9, (ci, acc)


def test_minibootstrap_missing_class(rng):
    pos, neg = make_class_problem(rng)
    c, p = pos.shape[:2]
    n_iter, batch = neg.shape[1], neg.shape[2]
    pos_valid = jnp.ones((c, p), bool).at[1].set(False)  # class 1: no positives
    params = MinibootstrapParams(m=16, sigma=3.0, lam=1e-5)
    models = train_classifiers_minibootstrap(
        jax.random.key(0), pos, pos_valid, neg,
        jnp.ones((c, n_iter, batch), bool), params,
    )
    assert bool(models.exists[0]) and not bool(models.exists[1])
    m1 = jax.tree.map(lambda a: a[1] if hasattr(a, "shape") and a.ndim else a, models)
    np.testing.assert_allclose(np.asarray(falkon_predict(m1, pos[1])), -2.0)


def test_minibootstrap_respects_batch_validity(rng):
    """Invalid negative rows must not influence the model: compare against
    the same data with garbage in the invalid slots."""
    pos, neg = make_class_problem(rng, n_cls=1)
    c, p = pos.shape[:2]
    n_iter, batch = neg.shape[1], neg.shape[2]
    neg_valid = jnp.asarray(rng.uniform(size=(c, n_iter, batch)) > 0.5)
    params = MinibootstrapParams(m=16, sigma=3.0, lam=1e-4)
    m_a = train_classifiers_minibootstrap(
        jax.random.key(7), pos, jnp.ones((c, p), bool), neg, neg_valid, params
    )
    garbage = jnp.where(neg_valid[..., None], neg, 1e3)
    m_b = train_classifiers_minibootstrap(
        jax.random.key(7), pos, jnp.ones((c, p), bool), garbage, neg_valid, params
    )
    probe = pos[0][:10]
    np.testing.assert_allclose(
        np.asarray(falkon_predict(jax.tree.map(lambda a: a[0] if hasattr(a, "ndim") and a.ndim else a, m_a), probe)),
        np.asarray(falkon_predict(jax.tree.map(lambda a: a[0] if hasattr(a, "ndim") and a.ndim else a, m_b), probe)),
        rtol=1e-3, atol=1e-3,
    )


def test_class_chunking_matches_full_vmap(rng):
    """class_chunk groups must reproduce the single-vmap result (incl. the
    zero-padded tail chunk) — the HBM-bounding path of the device pipeline."""
    import jax.numpy as jnp

    from online_detection_tpu.solvers.falkon import falkon_predict_classes
    from online_detection_tpu.utils.stats import FeatureStats

    c, p, i, b, d = 5, 6, 1, 6, 8
    pos = jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32) + 1.0)
    neg = jnp.asarray(rng.normal(size=(c, i, b, d)).astype(np.float32) - 1.0)
    pv, nv = jnp.ones((c, p), bool), jnp.ones((c, i, b), bool)
    stats = FeatureStats(jnp.zeros((d,)), jnp.ones((d,)), jnp.asarray(20.0))
    params = MinibootstrapParams(m=12, sigma=3.0, lam=1e-2)
    key = jax.random.key(0)
    full = train_classifiers_minibootstrap(key, pos, pv, neg, nv, params,
                                           stats=stats)
    chunked = train_classifiers_minibootstrap(key, pos, pv, neg, nv, params,
                                              stats=stats, class_chunk=2)
    x = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(falkon_predict_classes(chunked, x)),
        np.asarray(falkon_predict_classes(full, x)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(chunked.exists),
                                  np.asarray(full.exists))


def test_unrolled_matches_scan(rng):
    """The production (statically-unrolled, prefix-sliced) loop computes the
    same fixpoint as the scan path: identical cache membership at every
    iteration and matching models. The prefix slicing only removes rows the
    scan multiplies by exactly-zero weights, so any difference is reduction-
    order epsilon."""
    from online_detection_tpu.solvers.minibootstrap import (
        _falkon_fit_fn,
        _falkon_init_fn,
        _falkon_score_fn,
        _make_train_program,
    )

    pos, neg = make_class_problem(rng, n_cls=3, p=24, n_iter=4, batch=48)
    c = pos.shape[0]
    pv = jnp.ones(pos.shape[:2], bool)
    nv = jnp.ones(neg.shape[:3], bool)
    # knock out some rows so masking paths differ from the all-valid case
    pv = pv.at[1, 5:].set(False)
    nv = nv.at[2, 1, 10:].set(False)
    params = MinibootstrapParams(m=24, sigma=3.0, lam=1e-5)
    keys = jax.random.split(jax.random.key(7), c)

    scan_prog = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=False
    )
    unrolled_prog = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=True
    )
    (a_s, c_s), ex_s, (cv_s, nm_s) = scan_prog(keys, pos, pv, neg, nv, None, params)
    (a_u, c_u), ex_u, (cv_u, nm_u) = unrolled_prog(keys, pos, pv, neg, nv, None, params)

    np.testing.assert_array_equal(np.asarray(ex_s), np.asarray(ex_u))
    np.testing.assert_array_equal(np.asarray(cv_s), np.asarray(cv_u))
    np.testing.assert_array_equal(np.asarray(nm_s), np.asarray(nm_u))
    np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_u))
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_u), atol=1e-4)


def test_warm_train_program_registry(rng):
    """warm_train_program AOT-compiles + registers the production program;
    the subsequent train_classifiers_minibootstrap call executes THAT
    loaded executable (no jit recompile/reload) with identical results."""
    import jax

    from online_detection_tpu.solvers import minibootstrap as MB
    from online_detection_tpu.utils.stats import FeatureStats

    c, p_cap, n_iter, batch, d = 3, 6, 2, 8, 16
    params = MB.MinibootstrapParams(m=8, sigma=3.0, lam=1e-2)
    pos = jnp.asarray(rng.normal(size=(c, p_cap, d)).astype(np.float32) + 1.0)
    pv = jnp.ones((c, p_cap), bool)
    neg = jnp.asarray(rng.normal(size=(c, n_iter, batch, d)).astype(np.float32) - 1.0)
    nv = jnp.ones((c, n_iter, batch), bool)
    stats = FeatureStats(jnp.zeros((d,)), jnp.ones((d,)), jnp.asarray(20.0))
    key = jax.random.key(5)

    ref = MB.train_classifiers_minibootstrap(
        key, pos, pv, neg, nv, params, stats=stats
    )
    MB.warm_train_program(c, p_cap, n_iter, batch, d, params, with_stats=True)
    sig = MB._aot_signature(
        (jax.random.split(key, c), pos, pv, neg, nv, stats), params
    )
    assert sig in MB._AOT_PROGRAMS  # the production call will hit the AOT path
    got = MB.train_classifiers_minibootstrap(
        key, pos, pv, neg, nv, params, stats=stats
    )
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.centers), np.asarray(ref.centers)
    )


def test_make_train_program_one_wrapper_per_signature():
    """Regression (round-4 advisor, medium): exactly ONE jit wrapper per
    (fit, score, init, unrolled) signature. A fresh wrapper per call would
    re-trace and re-upload the ~120 MB unrolled executable on every
    AOT-registry miss; the lru_cache must make repeated calls identical."""
    from online_detection_tpu.solvers.minibootstrap import (
        _falkon_fit_fn,
        _falkon_init_fn,
        _falkon_score_fn,
        _make_train_program,
    )

    before = _make_train_program.cache_info()
    a1 = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=False
    )
    a2 = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=False
    )
    b1 = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=True
    )
    b2 = _make_train_program(
        _falkon_fit_fn, _falkon_score_fn, _falkon_init_fn, unrolled=True
    )
    assert a1 is a2 and b1 is b2 and a1 is not b1
    after = _make_train_program.cache_info()
    # at most two NEW cache entries (scan + unrolled); repeats are hits
    assert after.currsize - before.currsize <= 2
    assert after.hits >= before.hits + 2
