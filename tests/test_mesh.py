"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest).

Verifies the class-sharded minibootstrap (SURVEY.md §2.2: "the class axis as
a sharded mesh axis") against the unsharded solver, plus batch placement and
the make_mesh device-count guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_detection_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    train_classifiers_minibootstrap_sharded,
)
from online_detection_tpu.solvers.falkon import falkon_predict_classes
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)


# Pool sizes exactly fill the center quotas (6 positives = m//2, 6 negatives
# = m - m//2, one negative batch): center selection then takes every point
# once — no with-replacement duplicates, no padding — so K_MM is
# well-conditioned and f32 results are comparable across program partitions.
PARAMS = MinibootstrapParams(m=12, sigma=3.0, lam=1e-2)


def _toy_problem(rng, c=8, p_cap=6, n_iter=1, batch=6, d=8):
    pos = jnp.asarray(rng.normal(size=(c, p_cap, d)).astype(np.float32) + 1.0)
    neg = jnp.asarray(rng.normal(size=(c, n_iter, batch, d)).astype(np.float32) - 1.0)
    return pos, jnp.ones((c, p_cap), bool), neg, jnp.ones((c, n_iter, batch), bool)


def _scores(model, rng, d=8, n=32):
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return np.asarray(falkon_predict_classes(model, x))


def test_mesh_requires_enough_devices():
    assert make_mesh(8).devices.size == 8  # conftest forces 8 CPU devices
    with pytest.raises(ValueError, match="devices requested"):
        make_mesh(len(jax.devices()) + 1)


def test_sharded_minibootstrap_matches_unsharded(rng):
    pos, pv, neg, nv = _toy_problem(rng, c=8)
    key = jax.random.key(0)
    ref = train_classifiers_minibootstrap(key, pos, pv, neg, nv, PARAMS)
    mesh = make_mesh(8)
    got = train_classifiers_minibootstrap_sharded(
        key, pos, pv, neg, nv, PARAMS, mesh
    )
    assert got.alpha.shape == ref.alpha.shape == (8, PARAMS.m)
    # sharding must not change what the models PREDICT (alphas live in an
    # ill-conditioned dual space; scores are the contract)
    np.testing.assert_allclose(
        _scores(got, np.random.default_rng(7)),
        _scores(ref, np.random.default_rng(7)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(got.exists), np.asarray(ref.exists))
    # result is actually laid out over the mesh: one class per device
    shard_devs = {s.device.id for s in got.alpha.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_minibootstrap_pads_class_axis(rng):
    # 5 classes on an 8-device mesh: padding classes must not leak back
    pos, pv, neg, nv = _toy_problem(rng, c=5)
    key = jax.random.key(1)
    ref = train_classifiers_minibootstrap(key, pos, pv, neg, nv, PARAMS)
    got = train_classifiers_minibootstrap_sharded(
        key, pos, pv, neg, nv, PARAMS, make_mesh(8)
    )
    assert got.alpha.shape == (5, PARAMS.m)
    np.testing.assert_allclose(
        _scores(got, np.random.default_rng(9)),
        _scores(ref, np.random.default_rng(9)),
        rtol=1e-4, atol=1e-4,
    )
    assert bool(got.exists.all())


def test_batched_inference_matches_per_image(tmp_path):
    """run_inference(batch_size=8, mesh) returns the same predictions as the
    per-image path; the batch axis is sharded over the 8-device CPU mesh."""
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.models.detector import (
        DetectorConfig,
        init_detector_params,
    )
    from online_detection_tpu.pipelines.device_pipeline import (
        harvest_dataset_device,
        train_online_modules_device,
    )
    from online_detection_tpu.pipelines.online_pipeline import (
        OnlineTrainConfig,
        run_inference,
    )
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth")  # dir name selects the class table
    # setup mirrors test_device_pipeline's e2e tests exactly so every program
    # except the new B=8 sharded detect is reused (1-core sandbox: compiles
    # dominate the suite)
    make_synthetic_icwt(root, n_train=5, n_test=3)
    train_ds = ICubWorldDataset(root, "Main", "train")
    test_ds = ICubWorldDataset(root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, 20)
    cfg = OnlineTrainConfig(
        num_classes=19, det_m=24, rpn_m=24, segm_m=16,
        iterations=2, batch_size=48, segm_batch_size=256,
        rpn_pos_cap=128, det_pos_cap=64, coxy_cap=512,
    )
    dcfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40,
                          detections_per_img=10)
    kw = dict(dcfg=dcfg, gt_cap=4, min_size=128, max_size=320)
    state, _ = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192), **kw
    )
    online = train_online_modules_device(jax.random.key(2), state, cfg)
    r1, p1 = run_inference(params, online, test_ds, (128, 192), dcfg,
                           min_size=128, max_size=320)
    r8, p8 = run_inference(params, online, test_ds, (128, 192), dcfg,
                           min_size=128, max_size=320,
                           batch_size=8, mesh=make_mesh(8))
    assert len(p1) == len(p8) == 3
    for a, b in zip(p1, p8):
        assert len(a["boxes"]) == len(b["boxes"])
        np.testing.assert_allclose(a["boxes"], b["boxes"], rtol=1e-3, atol=0.1)
        np.testing.assert_array_equal(a["labels"], b["labels"])
    assert r1.keys() == r8.keys()


def test_shard_batch_places_batch_axis():
    mesh = make_mesh(8)
    tree = {
        "x": jnp.zeros((16, 4), jnp.float32),
        "y": jnp.zeros((16,), jnp.int32),
    }
    out = shard_batch(tree, mesh)
    for leaf in jax.tree.leaves(out):
        shards = leaf.addressable_shards
        assert len({s.device.id for s in shards}) == 8
        assert shards[0].data.shape[0] == 2  # 16 rows / 8 devices
