"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest).

Verifies the class-sharded minibootstrap (SURVEY.md §2.2: "the class axis as
a sharded mesh axis") against the unsharded solver, plus batch placement and
the make_mesh device-count guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.mesh

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


def test_sharded_solver_production_features(rng):
    """The production device-pipeline configuration on a mesh — stats-inside-
    the-program z-scoring + class chunking (rounded up to a mesh multiple) —
    matches the unsharded solver (VERDICT r2 next-item #5)."""
    from online_detection_tpu.utils.stats import FeatureStats

    pos, pv, neg, nv = _toy_problem(rng, c=10)
    stats = FeatureStats(
        jnp.full((8,), 0.1), jnp.ones((8,)), jnp.asarray(18.0)
    )
    key = jax.random.key(3)
    ref = train_classifiers_minibootstrap(
        key, pos, pv, neg, nv, PARAMS, stats=stats
    )
    got = train_classifiers_minibootstrap(
        key, pos, pv, neg, nv, PARAMS, stats=stats,
        mesh=make_mesh(8), class_chunk=4,  # rounds up to one 8-wide chunk
    )
    assert got.alpha.shape == ref.alpha.shape == (10, PARAMS.m)
    np.testing.assert_allclose(
        _scores(got, np.random.default_rng(11)),
        _scores(ref, np.random.default_rng(11)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(got.exists), np.asarray(ref.exists))


def test_flagship_cli_n_devices_matches_single_device(tmp_path, monkeypatch):
    """The REAL flagship CLI with --n_devices 8 (class-sharded solvers +
    batch-sharded harvest/inference on the virtual CPU mesh) trains the same
    models as the single-device device pipeline (VERDICT r2 next-item #2).

    Runs the scan-program solver on BOTH sides (ODTPU_SOLVER_UNROLL=0):
    this test's claim is mesh==single-device model equality, which is
    independent of the loop realization (scan==unroll is separately
    asserted by test_minibootstrap.py::test_unrolled_matches_scan and was
    re-verified on the real TPU in round 5); the unrolled programs' CPU
    compiles alone cost ~2/3 of this test's former ~13-min wall."""
    import os
    import sys

    monkeypatch.setenv("ODTPU_SOLVER_UNROLL", "0")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))
    import run_experiment_online_rpn_ood_oos as exp

    from online_detection_tpu.config.config import build_configs, load_yaml
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.data.transforms import canvas_size
    from online_detection_tpu.models.detector import init_detector_params
    from online_detection_tpu.pipelines.device_pipeline import (
        harvest_dataset_device,
        train_online_modules_device,
    )
    from online_detection_tpu.utils import checkpoint as ckpt
    from tests.fixtures import make_synthetic_icwt

    # slimmed configs (vs tests.test_experiment_cli's): 5 classes, 96x160
    # canvas — this test compiles the whole pipeline TWICE (sharded CLI +
    # single-device reference), so scale matters for the suite budget
    feat_cfg = """
MODEL:
  WEIGHT: ""
  RPN:
    PRE_NMS_TOP_N_TEST: 120
    POST_NMS_TOP_N_TEST: 30
  MASK_ON: True
DATASETS:
  TRAIN: ("path:{root}::train",)
  TEST: ("path:{root}::test",)
INPUT:
  MIN_SIZE_TEST: 96
  MAX_SIZE_TEST: 160
MINIBOOTSTRAP:
  RPN:
    POS_CAP: 96
  DETECTOR:
    NUM_CLASSES: 5
    ITERATIONS: 2
    BATCH_SIZE: 48
    SHUFFLE_NEGATIVES: True
    POS_CAP: 64
    COXY_CAP: 512
SEGMENTATION:
  BATCH_SIZE: 192
  POS_CAP: 128
EVALUATION:
  IOU_THRESHOLDS: (0.5,)
  USE_VOC07_METRIC: True
"""
    online_cfg = """
NUM_CLASSES: 6
ONLINE_REGION_CLASSIFIER:
  MINIBOOTSTRAP:
    EASY_THRESH: -0.9
    HARD_THRESH: -0.7
  CLASSIFIER: {lambda: 0.00001, sigma: 15, M: 24, kernel_type: 'gauss'}
REGION_REFINER:
  opts: {lambda: 1000}
ONLINE_SEGMENTATION:
  MINIBOOTSTRAP: {EASY_THRESH: -0.9, HARD_THRESH: -0.7}
  CLASSIFIER: {lambda: 0.000001, sigma: 10, M: 16, kernel_type: 'gauss'}
EVALUATION: {SCORE_THRESH: -2, NMS: 0.3, DETECTIONS_PER_IMAGE: 10}
RPN:
  ONLINE_REGION_CLASSIFIER:
    MINIBOOTSTRAP: {EASY_THRESH: -0.9, HARD_THRESH: -0.7}
    CLASSIFIER: {lambda: 0.001, sigma: 50, M: 24, kernel_type: 'gauss'}
  REGION_REFINER:
    opts: {lambda: 0.01}
"""

    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=5, n_test=3, image_hw=(120, 160))
    feat_path = tmp_path / "feat.yaml"
    feat_path.write_text(feat_cfg.format(root=root))
    online_path = tmp_path / "online.yaml"
    online_path.write_text(online_cfg)
    out_dir = str(tmp_path / "out")

    results = exp.main([
        "--output_dir", out_dir,
        "--config_file_feature_extraction", str(feat_path),
        "--config_file_online_rpn_detection_segmentation", str(online_path),
        "--save_RPN_detector_segmentation_models",
        "--CPU", "--n_devices", "8",
    ])
    assert "det_map_0.5" in results
    cli_models = ckpt.load_online_models(out_dir)

    # single-device run of the same projected config, same keys as the CLI
    train_cfg, det_cfg, extras = build_configs(
        load_yaml(str(feat_path)), load_yaml(str(online_path)), None
    )
    train_ds = ICubWorldDataset(root, "Main", "train")
    params = init_detector_params(jax.random.key(0), 15, train_cfg.num_classes + 1)
    info = train_ds.get_annotation(0)
    canvas = canvas_size(info.width, info.height,
                         extras["min_size_test"], extras["max_size_test"])
    state, _ = harvest_dataset_device(
        jax.random.key(1), params, train_ds, train_cfg, canvas,
        dcfg=det_cfg, min_size=extras["min_size_test"],
        max_size=extras["max_size_test"], batch_size=8,
    )
    ref = train_online_modules_device(jax.random.key(2), [state], train_cfg)
    del state

    for name, got_m, ref_m in [
        ("rpn", cli_models.rpn, ref.rpn),
        ("detector", cli_models.detector, ref.detector),
        ("mask", cli_models.mask, ref.mask),
    ]:
        np.testing.assert_array_equal(
            np.asarray(got_m.falkon.exists), np.asarray(ref_m.falkon.exists),
            err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(got_m.falkon.centers), np.asarray(ref_m.falkon.centers),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )
        # alpha is compared in PREDICTION space: the CG solve leaves the
        # coefficient vector free along near-null directions of the kernel
        # system, so cross-device summation order moves individual alpha
        # entries by a few percent while the classifier function is
        # unchanged (same reason every other equality test here scores a
        # probe set instead of diffing alpha)
        d_feat = int(got_m.falkon.centers.shape[-1])
        np.testing.assert_allclose(
            _scores(got_m.falkon, np.random.default_rng(7), d=d_feat),
            _scores(ref_m.falkon, np.random.default_rng(7), d=d_feat),
            rtol=2e-3, atol=2e-3, err_msg=name,
        )
        if hasattr(got_m, "rls") and got_m.rls is not None:
            np.testing.assert_allclose(
                np.asarray(got_m.rls.beta), np.asarray(ref_m.rls.beta),
                rtol=1e-3, atol=1e-3, err_msg=name,
            )


def test_sharded_rls_matches_unsharded(rng):
    """Class-sharded grouped RLS (mesh=) computes the same models as the
    single-device device_solve path: identical per-class moments (masked
    shared-buffer pass on both sides), class axis padded to the mesh."""
    from online_detection_tpu.solvers.rls import rls_fit_grouped

    # n=96: capb == n -> masked sharded program; n=600: capb=256 < n ->
    # class-sharded COMPACTED-BLOCKS program (the flagship-scale path)
    for n in (96, 600):
        d, c = 16, 5  # pads to 8 on the mesh
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        cls1 = jnp.asarray(rng.integers(1, c + 1, n).astype(np.float32))
        w = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))
        ref = rls_fit_grouped(x, y, cls1, w, c, 10.0, device_solve=True)
        got = rls_fit_grouped(x, y, cls1, w, c, 10.0, device_solve=True,
                              mesh=make_mesh(8))
        assert got.beta.shape == ref.beta.shape == (c, d + 1, 4)
        np.testing.assert_array_equal(np.asarray(got.exists),
                                      np.asarray(ref.exists))
        np.testing.assert_allclose(np.asarray(got.mu), np.asarray(ref.mu),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.beta), np.asarray(ref.beta),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got.t_inv), np.asarray(ref.t_inv),
                                   rtol=1e-4, atol=1e-4)
