"""Device-resident pipeline tests: grouped RLS vs per-class RLS, reservoir
append semantics, and the full device e2e slice vs the host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from online_detection_tpu.engine import device_accumulate as dacc
from online_detection_tpu.solvers.rls import rls_fit, rls_fit_grouped, rls_predict


def test_rls_grouped_matches_per_class(rng):
    n, d, c, lam = 200, 8, 3, 5.0
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, 4)).astype(np.float32)
    cls1 = rng.integers(1, c + 1, n)
    valid = rng.uniform(size=n) > 0.2

    m_grouped = rls_fit_grouped(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1.astype(np.float32)),
        jnp.asarray(valid.astype(np.float32)), c, lam,
    )
    # per-class buffers
    cap = int(max((cls1[valid] == i + 1).sum() for i in range(c)))
    xb = np.zeros((c, cap, d), np.float32)
    yb = np.zeros((c, cap, 4), np.float32)
    w = np.zeros((c, cap), np.float32)
    for i in range(c):
        rows = (cls1 == i + 1) & valid
        k = rows.sum()
        xb[i, :k] = x[rows]
        yb[i, :k] = y[rows]
        w[i, :k] = 1
    m_ref = rls_fit(jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(w), lam)
    probe = jnp.asarray(rng.normal(size=(10, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rls_predict(m_grouped, probe)),
        np.asarray(rls_predict(m_ref, probe)),
        rtol=1e-3, atol=1e-3,
    )


def test_pool_append_semantics(rng):
    pool = dacc.Pool.make(2, cap=10, d=3, extra=4)
    rows = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    valid = jnp.asarray([[True, True, False, False], [True, False, False, False]])
    pool = dacc._append(pool, rows, valid)
    assert pool.counts.tolist() == [2, 1]
    np.testing.assert_allclose(np.asarray(pool.rows[0, :2]), np.asarray(rows[0, :2]))
    # second append continues where the first ended
    pool = dacc._append(pool, rows, valid)
    assert pool.counts.tolist() == [4, 2]
    np.testing.assert_allclose(np.asarray(pool.rows[0, 2:4]), np.asarray(rows[0, :2]))


def test_shuffle_split_covers_pool(rng):
    pool = dacc.Pool.make(1, cap=20, d=2, extra=8)
    rows = jnp.asarray(np.arange(24 * 2, dtype=np.float32).reshape(1, 24, 2))
    # append 3 chunks of 6 valid rows
    for i in range(3):
        pool = dacc._append(
            pool, rows[:, i * 6 : i * 6 + 8], jnp.asarray([[True] * 6 + [False] * 2])
        )
    batches, valid = dacc.shuffle_split(jax.random.key(0), pool, 2, 10)
    assert batches.shape == (1, 2, 10, 2)
    got = set(map(tuple, np.asarray(batches[0].reshape(-1, 2))[np.asarray(valid[0]).reshape(-1)].tolist()))
    want = set(map(tuple, np.asarray(rows[0, :18]).reshape(-1, 2)[
        np.tile([True] * 6 + [False] * 2, 3)[:18 + 6][:24][:18]
    ].tolist()))
    # the 18 appended rows appear exactly once across the shuffled batches
    assert int(valid.sum()) == 18
    appended = np.concatenate([np.asarray(rows[0, i*6:i*6+6]) for i in range(3)])
    assert got == set(map(tuple, appended.tolist()))


def test_device_e2e_matches_host_quality(tmp_path, rng):
    """Full device pipeline on the synthetic dataset: runs, produces models
    with the same existence structure as the host pipeline."""
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.models.detector import DetectorConfig, init_detector_params
    from online_detection_tpu.pipelines.device_pipeline import (
        harvest_dataset_device,
        train_online_modules_device,
    )
    from online_detection_tpu.pipelines.online_pipeline import (
        OnlineTrainConfig,
        run_inference,
    )
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=5, n_test=3)
    train_ds = ICubWorldDataset(root, "Main", "train")
    test_ds = ICubWorldDataset(root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, 20)
    cfg = OnlineTrainConfig(
        num_classes=19, det_m=24, rpn_m=24, segm_m=16,
        iterations=2, batch_size=48, segm_batch_size=256,
    )
    dcfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40, detections_per_img=10)
    state, meta = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192),
        dcfg=dcfg, gt_cap=4, min_size=128, max_size=320,
    )
    assert int(state.n_images) == 5
    assert float(state.det_neg.counts.max()) > 0
    online = train_online_modules_device(jax.random.key(2), state, cfg)
    assert bool(online.detector.falkon.exists[9])  # 011_banana present
    assert online.rpn is not None and online.mask is not None
    results, preds = run_inference(
        params, online, test_ds, (128, 192), dcfg,
        min_size=128, max_size=320,
    )
    assert "det_map_0.5" in results
