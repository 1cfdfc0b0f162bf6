"""Differential parity tests against the LITERAL reference code.

Each test feeds identical synthetic inputs through a runnable reference
module (imported from /root/reference — pure torch/numpy, see
tests/ref_shims.py for the two compatibility shims) and through this
framework, then asserts the outputs agree:

- RLS refiner: ``solvers/rls.py`` vs ``RegionRefinerTrainer``
  (``region-refiner/region_refiner_trainer/train_region_refiner.py:54-118``),
  both lambda regimes (detector 1000, RPN 0.01) — Beta/T/T_inv/mu/losses.
- Feature statistics: ``utils/stats.py`` vs ``computeFeatStatistics_torch``
  / ``zScores`` (``py_od_utils.py:59-102``) with both sides pinned to the
  same deterministic sample indices (the reference samples unseeded).
- Box decoding: ``utils/boxes.py`` vs ``decode_boxes_detector``
  (``py_od_utils.py:247-274``).
- Mask IoU: ``data/evaluation/voc_eval.py`` vs ``mask_iou``
  (``py_od_utils.py:297-331``).
- Minibootstrap cache dynamics: the production mining loop
  (``solvers/minibootstrap.py``) vs the reference
  ``OnlineRegionClassifier.trainWithMinibootstrap``
  (``OnlineRegionClassifier.py:96-155``), both driven by the SAME
  deterministic stub classifier — identical cache membership per iteration.
"""

import os

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from tests.ref_shims import (
    deterministic_torch_sampling,
    install_maskrcnn_stub,
    legacy_torch,
    load_reference_module,
)


@pytest.fixture(scope="module")
def ref_refiner_mod():
    return load_reference_module(
        "src/modules/region-refiner/region_refiner_trainer/train_region_refiner.py",
        "ref_train_region_refiner",
    )


@pytest.fixture(scope="module")
def ref_utils_mod():
    return load_reference_module("src/py_od_utils.py", "ref_py_od_utils", ("src",))


@pytest.fixture(scope="module")
def ref_classifier_mod():
    install_maskrcnn_stub()
    return load_reference_module(
        "src/modules/region-classifier/OnlineRegionClassifier.py",
        "ref_online_region_classifier",
        ("src/modules/region-classifier", "src/modules", "src"),
    )


# ---------------------------------------------------------------- RLS refiner


def _make_coxy(rng, n, d, num_real_classes, zero_based):
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(scale=0.3, size=(n, 4)).astype(np.float32)
    lo = 0 if zero_based else 1
    c = rng.integers(lo, lo + num_real_classes, size=n).astype(np.int64)
    return x, y, c


@pytest.mark.parametrize("lam,is_rpn", [(1000.0, False), (0.01, True)])
def test_rls_matches_reference_trainer(ref_refiner_mod, lam, is_rpn):
    rng = np.random.default_rng(7)
    num_real = 3
    d = 16
    x, y, c = _make_coxy(rng, 320, d, num_real, zero_based=is_rpn)

    chosen = ["__background__"] + [f"cls{i}" for i in range(num_real)]
    if is_rpn:
        # reference RPN regressors index anchors 0..A-1 (start_index=0) and
        # CHOSEN_CLASSES has one entry per anchor class
        chosen = [f"anchor{i}" for i in range(num_real)]
    cfg = {"CHOSEN_CLASSES": chosen, "REGION_REFINER": {"opts": {}}}

    trainer = ref_refiner_mod.RegionRefinerTrainer(cfg, lam, is_rpn)
    with legacy_torch():
        ref_models = trainer(
            {
                "C": torch.from_numpy(c),
                "O": None,
                "X": torch.from_numpy(x.copy()),
                "Y": torch.from_numpy(y.copy()),
            }
        )

    from online_detection_tpu.pipelines.online_pipeline import _fit_rls_per_class

    model = _fit_rls_per_class(x, y, c, num_real, lam, zero_based=is_rpn)
    beta = np.asarray(model.beta)
    t = np.asarray(model.t)
    t_inv = np.asarray(model.t_inv)
    mu = np.asarray(model.mu)
    losses = np.asarray(model.mean_losses)

    assert len(ref_models) == num_real
    for i in range(num_real):
        ref = ref_models[i]
        assert ref["mu"] is not None
        np.testing.assert_allclose(mu[i], ref["mu"].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(t[i], ref["T"].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            t_inv[i], ref["T_inv"].numpy(), rtol=1e-3, atol=1e-4
        )
        ref_beta = np.stack(
            [ref["Beta"][str(k)]["weights"].numpy() for k in range(4)], axis=1
        )  # [d+1, 4]
        scale = max(np.abs(ref_beta).max(), 1e-3)
        np.testing.assert_allclose(
            beta[i], ref_beta, rtol=2e-3, atol=2e-3 * scale
        )
        ref_losses = np.array(
            [ref["Beta"][str(k)]["losses"].mean().item() for k in range(4)]
        )
        np.testing.assert_allclose(losses[i], ref_losses, rtol=2e-2, atol=1e-4)


def test_rls_reference_empty_class(ref_refiner_mod):
    """A class with zero COXY rows: reference stores None, we store exists=False."""
    rng = np.random.default_rng(3)
    x, y, c = _make_coxy(rng, 60, 8, 2, zero_based=False)
    c[c == 2] = 1  # class 2 has no rows
    cfg = {
        "CHOSEN_CLASSES": ["__background__", "a", "b"],
        "REGION_REFINER": {"opts": {}},
    }
    trainer = ref_refiner_mod.RegionRefinerTrainer(cfg, 1000.0, False)
    with legacy_torch():
        ref_models = trainer(
            {
                "C": torch.from_numpy(c),
                "O": None,
                "X": torch.from_numpy(x),
                "Y": torch.from_numpy(y),
            }
        )
    assert ref_models[1]["Beta"] is None

    from online_detection_tpu.pipelines.online_pipeline import _fit_rls_per_class

    model = _fit_rls_per_class(x, y, c, 2, 1000.0, zero_based=False)
    assert bool(model.exists[0]) and not bool(model.exists[1])
    assert np.all(np.asarray(model.beta[1]) == 0)


# --------------------------------------------------------- feature statistics


def test_feature_stats_match_reference(ref_utils_mod):
    rng = np.random.default_rng(11)
    c, d, n_batches = 3, 12, 2
    pos_counts = [7, 5, 9]
    neg_counts = [[8, 6], [8, 8], [4, 7]]

    p_cap = max(pos_counts)
    b_cap = max(max(row) for row in neg_counts)
    pos = np.zeros((c, p_cap, d), np.float32)
    pv = np.zeros((c, p_cap), bool)
    neg = np.zeros((c, n_batches, b_cap, d), np.float32)
    nv = np.zeros((c, n_batches, b_cap), bool)
    ref_pos, ref_neg = [], []
    for i in range(c):
        rows = rng.normal(size=(pos_counts[i], d)).astype(np.float32)
        pos[i, : len(rows)] = rows
        pv[i, : len(rows)] = True
        ref_pos.append(torch.from_numpy(rows))
        ref_neg.append([])
        for j in range(n_batches):
            nrows = rng.normal(size=(neg_counts[i][j], d)).astype(np.float32)
            neg[i, j, : len(nrows)] = nrows
            nv[i, j, : len(nrows)] = True
            ref_neg[i].append(torch.from_numpy(nrows))

    with legacy_torch(), deterministic_torch_sampling():
        ref_stats = ref_utils_mod.computeFeatStatistics_torch(
            ref_pos, ref_neg, num_samples=60, features_dim=d,
            cpu_tensor=True, pos_fraction=0.8,
        )

    from online_detection_tpu.utils.stats import compute_feature_stats

    stats = compute_feature_stats(
        np.random.default_rng(0),
        jnp.asarray(pos), jnp.asarray(pv), jnp.asarray(neg), jnp.asarray(nv),
        num_samples=60, pos_fraction=0.8,
        index_fn=lambda n, size: np.arange(size) % max(n, 1),
    )
    np.testing.assert_allclose(
        np.asarray(stats.mean), ref_stats["mean"].numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats.std), ref_stats["std"].numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        float(stats.mean_norm), ref_stats["mean_norm"].item(), rtol=1e-5
    )


def test_zscore_matches_reference(ref_utils_mod):
    rng = np.random.default_rng(5)
    feat = rng.normal(size=(17, 9)).astype(np.float32)
    mean = rng.normal(size=(9,)).astype(np.float32)
    mean_norm = np.float32(13.7)

    with legacy_torch():
        ref = ref_utils_mod.zScores(
            torch.from_numpy(feat.copy()),
            torch.from_numpy(mean),
            torch.tensor(mean_norm),
        ).numpy()

    from online_detection_tpu.utils.stats import FeatureStats, zscore

    stats = FeatureStats(
        jnp.asarray(mean), jnp.zeros((9,)), jnp.asarray(mean_norm)
    )
    np.testing.assert_allclose(np.asarray(zscore(jnp.asarray(feat), stats)), ref,
                               rtol=1e-6, atol=1e-6)


# --------------------------------------------------------------- box decoding


class _BoxListStub:
    def __init__(self, bbox, size_wh):
        self.bbox = bbox
        self.size = size_wh


def test_decode_boxes_matches_reference(ref_utils_mod):
    rng = np.random.default_rng(9)
    n, num_cls = 24, 5
    boxes = np.sort(rng.uniform(0, 400, size=(n, 2, 2)), axis=1)
    boxes = boxes.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)  # x1y1x2y2
    deltas = rng.normal(scale=0.4, size=(n, 4 * num_cls)).astype(np.float32)
    img_w, img_h = 640, 480

    with legacy_torch():
        ref = ref_utils_mod.decode_boxes_detector(
            _BoxListStub(torch.from_numpy(boxes), (img_w, img_h)),
            torch.from_numpy(deltas),
        ).numpy()

    from online_detection_tpu.utils.boxes import clip_boxes_one_sided, decode_boxes

    # the on-line detector decode does NOT clamp exp() args (clip_exp=False)
    # and clips asymmetrically (x1/y1 from below, x2/y2 from above only)
    mine = clip_boxes_one_sided(
        decode_boxes(jnp.asarray(deltas), jnp.asarray(boxes), clip_exp=False),
        (img_w, img_h),
    )
    np.testing.assert_allclose(np.asarray(mine), ref, rtol=1e-4, atol=1e-3)


def test_region_predictor_matches_reference(ref_refiner_mod):
    """Standalone RegionPredictor (``predict_regions.py:16-80``): the
    reference's trained models are converted into an RLSModel, then both
    predictors decode the same features/boxes — isolating predictor parity
    from the (separately tested) trainer parity."""
    rng = np.random.default_rng(17)
    num_real, d, n = 3, 16, 40
    x, y, c = _make_coxy(rng, 300, d, num_real, zero_based=False)
    chosen = ["__background__"] + [f"cls{i}" for i in range(num_real)]
    cfg = {"CHOSEN_CLASSES": chosen, "REGION_REFINER": {"opts": {}}}
    trainer = ref_refiner_mod.RegionRefinerTrainer(cfg, 1000.0, False)
    with legacy_torch():
        ref_models = trainer(
            {
                "C": torch.from_numpy(c),
                "O": None,
                "X": torch.from_numpy(x.copy()),
                "Y": torch.from_numpy(y.copy()),
            }
        )

    predictor_mod = load_reference_module(
        "src/modules/region-refiner/region_predictor/predict_regions.py",
        "ref_predict_regions",
    )
    feat = rng.normal(size=(n, d)).astype(np.float32)
    boxes = np.sort(rng.uniform(0, 300, size=(n, 2, 2)), axis=1)
    boxes = boxes.transpose(0, 2, 1).reshape(n, 4).astype(np.float32)
    img_w, img_h = 640, 480

    stub = _BoxListStub(torch.from_numpy(boxes.copy()), (img_w, img_h))
    with legacy_torch():
        out = predictor_mod.RegionPredictor(cfg, ref_models).predict(
            [stub], [{"feat": feat, "gt": np.zeros((n,), np.int64)}]
        )
    ref_boxes = out[0].bbox.numpy()[:, 1:, :]  # drop the class-0 originals

    from online_detection_tpu.modules.facades import RegionRefiner
    from online_detection_tpu.solvers.rls import RLSModel

    beta = np.stack(
        [
            np.stack(
                [m["Beta"][str(k)]["weights"].numpy() for k in range(4)], axis=1
            )
            for m in ref_models
        ]
    )
    model = RLSModel(
        beta=jnp.asarray(beta),
        t_inv=jnp.asarray(np.stack([m["T_inv"].numpy() for m in ref_models])),
        t=jnp.asarray(np.stack([m["T"].numpy() for m in ref_models])),
        mu=jnp.asarray(np.stack([m["mu"].numpy() for m in ref_models])),
        exists=jnp.ones((num_real,), bool),
        mean_losses=jnp.zeros((num_real, 4)),
    )
    refiner = RegionRefiner()
    refiner.models = model
    mine = refiner.predict(boxes, feat, (img_w, img_h)).reshape(n, num_real, 4)
    np.testing.assert_allclose(mine, ref_boxes, rtol=1e-4, atol=5e-3)


# ------------------------------------------------------------------- mask IoU


def test_mask_iou_matches_reference(ref_utils_mod):
    rng = np.random.default_rng(13)
    a = rng.random((6, 20, 30)) > 0.6
    b = rng.random((4, 20, 30)) > 0.4

    ref = ref_utils_mod.mask_iou(a, b)

    from online_detection_tpu.data.evaluation.voc_eval import mask_iou

    np.testing.assert_allclose(mask_iou(a, b), ref, rtol=1e-6, atol=1e-7)


# ------------------------------------------------------- feature-cache loaders


class _DetRng:
    """Deterministic stand-in for np.random.Generator matching the pinned
    torch sampling scheme (tests/ref_shims.deterministic_torch_sampling)."""

    def integers(self, lo, hi=None, size=None):
        n = hi if hi is not None else lo
        return np.arange(size) % max(int(n), 1)

    def permutation(self, n):
        return np.arange(int(n) - 1, -1, -1)


def test_shuffle_negatives_matches_reference(ref_utils_mod):
    rng = np.random.default_rng(23)
    d = 6
    neg = [
        [rng.normal(size=(n, d)).astype(np.float32) for n in (7, 5, 9)],
        [rng.normal(size=(n, d)).astype(np.float32) for n in (4, 8)],
    ]
    with legacy_torch(), deterministic_torch_sampling():
        ref = ref_utils_mod.shuffle_negatives(
            [[torch.from_numpy(b) for b in cls] for cls in neg],
            batch_size=6, num_batches=3,
        )

    from online_detection_tpu.utils.checkpoint import rebatch_negatives_shuffled

    det = _DetRng()
    for i, cls in enumerate(neg):
        mine = rebatch_negatives_shuffled(cls, 6, 3, det.permutation)
        assert len(mine) == len(ref[i]) == 3
        for j in range(3):
            np.testing.assert_array_equal(mine[j], ref[i][j].numpy())


def _write_reference_cache(d, pos_per_class, neg_per_class, coxy=None):
    """Write a reference-format (extensionless torch pickle) feature cache."""
    os.makedirs(d, exist_ok=True)
    for c, batches in enumerate(pos_per_class):
        for b, rows in enumerate(batches):
            torch.save(torch.from_numpy(rows), os.path.join(d, f"positives_cl_{c}_batch_{b}"))
    for c, batches in enumerate(neg_per_class):
        for b, rows in enumerate(batches):
            torch.save(torch.from_numpy(rows), os.path.join(d, f"negatives_cl_{c}_batch_{b}"))
    if coxy is not None:
        for i, (x, cc, y) in enumerate(coxy):
            torch.save(torch.from_numpy(x), os.path.join(d, f"reg_x_batch_{i}"))
            torch.save(torch.from_numpy(cc), os.path.join(d, f"reg_c_batch_{i}"))
            torch.save(torch.from_numpy(y), os.path.join(d, f"reg_y_batch_{i}"))


def test_load_features_classifier_matches_reference(ref_utils_mod, tmp_path):
    """Reference-written torch caches read by BOTH loaders (incl. the
    shuffle-negatives re-batching driven by the feature-extraction YAML)."""
    rng = np.random.default_rng(29)
    d = 5
    pos = [
        [rng.normal(size=(3, d)).astype(np.float32), rng.normal(size=(2, d)).astype(np.float32)],
        [np.zeros((0, d), np.float32)],  # class with no positives
    ]
    neg = [
        [rng.normal(size=(n, d)).astype(np.float32) for n in (6, 4, 5)],
        [rng.normal(size=(n, d)).astype(np.float32) for n in (3, 7)],
    ]
    cache = tmp_path / "features_detector"
    _write_reference_cache(str(cache), pos, neg)

    feat_cfg = tmp_path / "feat_extraction.yaml"
    feat_cfg.write_text(
        yaml.safe_dump(
            {"MINIBOOTSTRAP": {"DETECTOR": {
                "SHUFFLE_NEGATIVES": True, "ITERATIONS": 3, "BATCH_SIZE": 4,
            }}}
        )
    )
    with legacy_torch(), deterministic_torch_sampling():
        ref_pos, ref_neg = ref_utils_mod.load_features_classifier(
            features_dir=str(cache), cfg_feature_extraction=str(feat_cfg)
        )

    from online_detection_tpu.utils.checkpoint import load_features

    out = load_features(
        str(tmp_path), det_shuffle_negatives=True, iterations=3, batch_size=4,
        rng=_DetRng(),
    )
    det = out["det"]
    for c in range(2):
        mine_pos = det["pos"][c][det["pos_valid"][c]]
        np.testing.assert_allclose(mine_pos, ref_pos[c].numpy(), rtol=1e-6)
        for j in range(3):
            mine_b = det["neg"][c, j][det["neg_valid"][c, j]]
            np.testing.assert_allclose(mine_b, ref_neg[c][j].numpy(), rtol=1e-6)


def test_load_features_segmentation_ratio_matches_reference(ref_utils_mod, tmp_path):
    rng = np.random.default_rng(31)
    d = 4
    pos = [[rng.normal(size=(10, d)).astype(np.float32)]]
    neg = [[rng.normal(size=(8, d)).astype(np.float32),
            rng.normal(size=(6, d)).astype(np.float32)]]
    cache = tmp_path / "features_segmentation"
    _write_reference_cache(str(cache), pos, neg)

    with legacy_torch(), deterministic_torch_sampling():
        ref_pos, ref_neg = ref_utils_mod.load_features_classifier(
            features_dir=str(cache), is_segm=True, sample_ratio=0.5
        )

    from online_detection_tpu.utils.checkpoint import load_features

    out = load_features(str(tmp_path), sampling_ratio_segmentation=0.5, rng=_DetRng())
    seg = out["mask"]
    mine_pos = seg["pos"][0][seg["pos_valid"][0]]
    np.testing.assert_allclose(mine_pos, ref_pos[0].numpy(), rtol=1e-6)
    assert len(mine_pos) == 5  # 10 * 0.5
    mine_neg = seg["neg"][0, 0][seg["neg_valid"][0, 0]]
    np.testing.assert_allclose(mine_neg, ref_neg[0].numpy(), rtol=1e-6)
    assert len(mine_neg) == 7  # (8 + 6) * 0.5


def test_load_features_regressor_matches_reference(ref_utils_mod, tmp_path):
    rng = np.random.default_rng(37)
    d = 5
    coxy_batches = [
        (rng.normal(size=(6, d)).astype(np.float32),
         rng.integers(1, 3, size=6).astype(np.int64),
         rng.normal(size=(6, 4)).astype(np.float32)),
        (rng.normal(size=(4, d)).astype(np.float32),
         rng.integers(1, 3, size=4).astype(np.int64),
         rng.normal(size=(4, 4)).astype(np.float32)),
    ]
    cache = tmp_path / "features_detector"
    _write_reference_cache(
        str(cache), [[rng.normal(size=(2, d)).astype(np.float32)]],
        [[rng.normal(size=(3, d)).astype(np.float32)]], coxy=coxy_batches,
    )
    with legacy_torch():
        ref_coxy = ref_utils_mod.load_features_regressor(features_dir=str(cache))

    from online_detection_tpu.utils.checkpoint import load_features

    coxy = load_features(str(tmp_path))["det"]["coxy"]
    np.testing.assert_allclose(coxy["X"], ref_coxy["X"].numpy(), rtol=1e-6)
    np.testing.assert_array_equal(coxy["C"], ref_coxy["C"].numpy())
    np.testing.assert_allclose(coxy["Y"], ref_coxy["Y"].numpy(), rtol=1e-6)


def test_load_positives_from_coxy_matches_reference(ref_utils_mod):
    rng = np.random.default_rng(41)
    n, d = 60, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    c = rng.integers(1, 4, size=n).astype(np.int64)
    y = rng.normal(size=(n, 4)).astype(np.float32)

    with legacy_torch(), deterministic_torch_sampling():
        ref_pos = ref_utils_mod.load_positives_from_COXY(
            {"C": torch.from_numpy(c), "O": None, "X": torch.from_numpy(x),
             "Y": torch.from_numpy(y)},
            samples_fraction=0.5,
        )

    from online_detection_tpu.pipelines.online_pipeline import _positives_from_coxy

    pos, valid = _positives_from_coxy(
        {"X": x, "C": c}, 3, samples_fraction=0.5, rng=_DetRng()
    )
    for i in range(3):
        np.testing.assert_allclose(
            pos[i][valid[i]], ref_pos[i].numpy(), rtol=1e-6,
            err_msg=f"class {i}",
        )


class _GaussianStubClassifier:
    """Torch Gaussian-kernel scorer == what the falkon library computes for a
    fitted model (solver parity is tested separately in test_falkon.py); lets
    the reference ``testRegionClassifier`` wrapper logic run unmodified."""

    def __init__(self, sigma):
        self.sigma = sigma

    def train(self, X, y, sigma=None, lam=None):
        raise AssertionError("test path only")

    def predict(self, model, X):
        centers, alpha = model
        d2 = torch.cdist(X.float(), centers) ** 2
        return torch.exp(-d2 / (2 * self.sigma**2)) @ alpha


def test_test_region_classifier_matches_reference(ref_classifier_mod, tmp_path):
    """The cached-test_boxes scoring path (``OnlineRegionClassifier.py:
    182-219``): gt-row filtering, conditional z-scoring, per-class scoring
    into the [N, C+1] matrix with background -1."""
    rng = np.random.default_rng(43)
    c, d, m, sigma = 2, 6, 5, 4.0

    centers = [rng.normal(size=(m, d)).astype(np.float32) for _ in range(c)]
    alpha = [rng.normal(size=(m,)).astype(np.float32) for _ in range(c)]
    mean = rng.normal(size=(d,)).astype(np.float32)
    mean_norm = np.float32(9.0)

    test_boxes = []
    for _ in range(3):
        n = int(rng.integers(4, 9))
        gt = (rng.random(n) < 0.3).astype(np.int64)
        test_boxes.append({
            "boxes": rng.uniform(0, 100, size=(n, 4)).astype(np.float32),
            "feat": rng.normal(size=(n, d)).astype(np.float32),
            "gt": gt,
            "img_size": (320, 240),
        })

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "CHOSEN_CLASSES": ["__background__", "a", "b"],
        "ONLINE_REGION_CLASSIFIER": {
            "CLASSIFIER": {"lambda": 1e-5, "sigma": sigma, "M": m},
            "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
        },
    }))
    stub = _GaussianStubClassifier(sigma)
    stats = {
        "mean": torch.from_numpy(mean),
        "std": torch.ones(d),
        "mean_norm": torch.tensor(mean_norm),
    }
    dummy = [torch.zeros((1, d))] * c
    ocr = ref_classifier_mod.OnlineRegionClassifier(
        stub, dummy, [[torch.zeros((1, d))]] * c, stats, cfg_path=str(cfg_path)
    )
    ref_models = [
        (torch.from_numpy(centers[i]), torch.from_numpy(alpha[i]))
        for i in range(c)
    ]
    with legacy_torch():
        ref_preds = ocr.testRegionClassifier(ref_models, test_boxes)

    from online_detection_tpu.modules import facades
    from online_detection_tpu.solvers.falkon import FalkonModel

    wrapper = facades.FALKONWrapper()
    mine = facades.OnlineRegionClassifier(
        wrapper, [np.zeros((1, d))] * c, [[np.zeros((1, d))]] * c,
        {"mean": mean, "std": np.ones(d), "mean_norm": mean_norm},
    )
    model = FalkonModel(
        jnp.asarray(np.stack(centers)), jnp.asarray(np.stack(alpha)),
        jnp.ones((c,), bool), sigma,
    )
    my_preds = mine.testRegionClassifier(model, test_boxes)

    assert len(my_preds) == len(ref_preds) == 3
    for mp, rp in zip(my_preds, ref_preds):
        np.testing.assert_allclose(mp["boxes"], rp.bbox.numpy(), rtol=1e-6)
        np.testing.assert_allclose(
            mp["scores"], rp.get_field("scores").numpy(), rtol=2e-4, atol=2e-5
        )


# ----------------------------------------------- minibootstrap cache dynamics


class _StubClassifier:
    """Deterministic classifier shared by both sides of the differential test.

    ``train`` returns the cache size as the "model"; ``predict`` scores
    ``x[:, 0] + coupling * model`` — deterministic, yet model-dependent so the
    hard/easy mining dynamics differ across iterations.
    """

    COUPLING = 0.003

    def __init__(self):
        self.fit_log = []  # (ids_sorted, n_pos, n_neg) per updateModel call

    def train(self, X, y, sigma=None, lam=None):
        ids = np.sort(X[:, 1].numpy().astype(np.int64))
        self.fit_log.append((ids, int((y > 0).sum()), int((y < 0).sum())))
        return float(len(X))

    def predict(self, model, X):
        return X[:, 0] + self.COUPLING * model


def _stub_fit(key, cache_x, y, cache_is_pos, cache_valid, params):
    return jnp.sum(cache_valid.astype(jnp.float32))


def _stub_score(model, x, params):
    return x[:, 0] + _StubClassifier.COUPLING * model


def _stub_init(p_cap, d, params):
    return jnp.float32(0.0)


def test_minibootstrap_cache_membership_matches_reference(
    ref_classifier_mod, tmp_path
):
    rng = np.random.default_rng(21)
    c, d = 2, 3
    n_iter, b_cap = 4, 8
    pos_counts = [4, 6]
    neg_counts = [[8, 5, 8, 3], [6, 8, 4, 8]]

    # rows carry a unique id in column 1; column 0 is the score channel
    next_id = [0]

    def make_rows(n, score_lo=-1.5, score_hi=0.5):
        scores = rng.uniform(score_lo, score_hi, size=(n,))
        ids = np.arange(next_id[0], next_id[0] + n)
        next_id[0] += n
        filler = rng.normal(size=(n,))
        return np.stack([scores, ids, filler], axis=1).astype(np.float32)

    p_cap = max(pos_counts)
    pos = np.zeros((c, p_cap, d), np.float32)
    pv = np.zeros((c, p_cap), bool)
    neg = np.zeros((c, n_iter, b_cap, d), np.float32)
    nv = np.zeros((c, n_iter, b_cap), bool)
    ref_pos, ref_neg = [], []
    for i in range(c):
        rows = make_rows(pos_counts[i])
        pos[i, : len(rows)] = rows
        pv[i, : len(rows)] = True
        ref_pos.append(torch.from_numpy(rows))
        ref_neg.append([])
        for j in range(n_iter):
            nrows = make_rows(neg_counts[i][j])
            neg[i, j, : len(nrows)] = nrows
            nv[i, j, : len(nrows)] = True
            ref_neg[i].append(torch.from_numpy(nrows))

    # ---- reference loop with the stub classifier
    cfg_path = tmp_path / "online_cfg.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {
                "CHOSEN_CLASSES": ["__background__", "a", "b"],
                "ONLINE_REGION_CLASSIFIER": {
                    "CLASSIFIER": {"lambda": 0.001, "sigma": 5, "M": 10},
                    "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
                },
            }
        )
    )
    stub = _StubClassifier()
    stats = {
        "mean": torch.zeros(d),
        "std": torch.ones(d),
        "mean_norm": torch.tensor(20.0),
    }
    ocr = ref_classifier_mod.OnlineRegionClassifier(
        stub, ref_pos, ref_neg, stats, cfg_path=str(cfg_path)
    )
    ocr.trainWithMinibootstrap(ref_neg, ref_pos)
    assert len(stub.fit_log) == c * n_iter

    # ---- the production loop with the same stub
    from online_detection_tpu.solvers.minibootstrap import (
        MinibootstrapParams,
        minibootstrap_trace,
    )

    params = MinibootstrapParams(hard_thresh=-0.7, easy_thresh=-0.9)
    keys = jax.random.split(jax.random.key(0), c)
    _, exists, (cache_valid, neg_mask) = minibootstrap_trace(
        keys, jnp.asarray(pos), jnp.asarray(pv), jnp.asarray(neg),
        jnp.asarray(nv), params,
        fit_fn=_stub_fit, score_fn=_stub_score, init_fn=_stub_init,
    )
    cache_valid = np.asarray(cache_valid)  # [C, I, P + I*B]
    assert bool(exists[0]) and bool(exists[1])

    # cache row ids in my static layout: [pos slots | neg block slots]
    for i in range(c):
        cache_ids = np.concatenate(
            [pos[i, :, 1], neg[i].reshape(-1, d)[:, 1]]
        ).astype(np.int64)
        for j in range(n_iter):
            ref_ids, ref_npos, ref_nneg = stub.fit_log[i * n_iter + j]
            mine_mask = cache_valid[i, j]
            mine_ids = np.sort(cache_ids[mine_mask])
            np.testing.assert_array_equal(
                mine_ids, ref_ids,
                err_msg=f"cache membership diverged at class {i} iter {j}",
            )
            n_pos_mine = int(mine_mask[:p_cap].sum())
            assert n_pos_mine == ref_npos
            assert int(mine_mask[p_cap:].sum()) == ref_nneg
