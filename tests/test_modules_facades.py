"""API-parity facade tests: the reference's class-shaped workflow driven
against the functional internals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from online_detection_tpu.modules.facades import (
    FALKONWrapper,
    OnlineRegionClassifier,
    RegionRefiner,
)


def test_falkon_wrapper_train_predict(rng):
    w = FALKONWrapper()
    w.sigma, w.lam, w.nyst_centers = 2.0, 1e-5, 32
    x = rng.normal(size=(200, 8)).astype(np.float32)
    y = np.sign(x[:, 0]).astype(np.float32)
    model = w.train(x, y)
    pred = np.asarray(w.predict(model, x))
    assert ((pred > 0) == (y > 0)).mean() > 0.9


def test_online_region_classifier_reference_layout(rng):
    """positives as list-of-arrays, negatives as list-of-batches (the
    reference's exact data layout)."""
    d = 6
    mk = lambda n, shift: (rng.normal(size=(n, d)) + shift).astype(np.float32)
    positives = [mk(30, 2.0), mk(25, -2.0)]
    negatives = [
        [mk(40, -1.0), mk(40, -1.5)],
        [mk(40, 1.0), mk(40, 1.5)],
    ]
    stats = {
        "mean": np.zeros(d, np.float32),
        "std": np.ones(d, np.float32),
        "mean_norm": np.float32(20.0),
    }
    clf = FALKONWrapper()
    clf.sigma, clf.lam, clf.nyst_centers = 3.0, 1e-5, 16
    oc = OnlineRegionClassifier(clf, positives, negatives, stats)
    oc.sigma, oc.lam = 3.0, 1e-5
    models = oc.trainRegionClassifier()
    assert models.alpha.shape == (2, 16)
    # separates its own training data
    from online_detection_tpu.solvers.falkon import falkon_predict_classes

    scores = np.asarray(falkon_predict_classes(models, jnp.asarray(positives[0])))
    assert (scores[:, 0] > 0).mean() > 0.8

    # test path over cached test_boxes (standalone contract)
    test_boxes = [
        {
            "boxes": rng.uniform(0, 100, (10, 4)).astype(np.float32),
            "feat": rng.normal(size=(10, d)).astype(np.float32),
            "gt": np.concatenate([np.ones(2), np.zeros(8)]),
            "img_size": np.array([320, 240]),
        }
    ]
    preds = oc.testRegionClassifier(models, test_boxes)
    assert len(preds) == 1
    assert preds[0]["scores"].shape == (8, 3)  # non-GT rows x (bg + 2 classes)
    np.testing.assert_allclose(preds[0]["scores"][:, 0], -1.0)


def test_update_model_incremental_retrain(rng):
    """updateModel (``OnlineRegionClassifier.py:81-94``): retrain one class
    from a {pos, neg} cache — the incremental-teaching surface."""
    d = 6
    mk = lambda n, shift: (rng.normal(size=(n, d)) + shift).astype(np.float32)
    stats = {
        "mean": np.zeros(d, np.float32),
        "std": np.ones(d, np.float32),
        "mean_norm": np.float32(20.0),
    }
    clf = FALKONWrapper()
    clf.sigma, clf.lam, clf.nyst_centers = 3.0, 1e-5, 16
    oc = OnlineRegionClassifier(clf, [mk(10, 2.0)], [[mk(10, -2.0)]], stats)
    oc.sigma, oc.lam = 3.0, 1e-5
    cache = {"pos": mk(30, 2.0), "neg": mk(60, -2.0)}
    model = oc.updateModel(cache)
    s_pos = np.asarray(clf.predict(model, mk(20, 2.0)))
    s_neg = np.asarray(clf.predict(model, mk(20, -2.0)))
    assert (s_pos > 0).mean() > 0.9
    assert (s_neg < 0).mean() > 0.9
    # a second update with more data refreshes the model (same surface)
    cache["neg"] = np.concatenate([cache["neg"], mk(30, -1.0)])
    model2 = oc.updateModel(cache)
    assert np.asarray(model2.centers).shape == np.asarray(model.centers).shape


def test_region_refiner_coxy_contract(rng):
    n, d = 120, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    wtrue = rng.normal(size=(d, 4)) * 0.1
    y = (x @ wtrue).astype(np.float32)
    coxy = {"X": x, "Y": y, "C": np.ones(n), "O": None}
    rr = RegionRefiner()
    rr.lam = 1.0
    rr.num_classes = 1
    models = rr.trainRegionRefiner(coxy)
    assert models.beta.shape == (1, d + 1, 4)
    boxes = rng.uniform(10, 50, (5, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    out = rr.predict(boxes[:, :4], x[:5], (320, 240))
    assert out.shape == (5, 4)


def test_feature_extractor_test_method(tmp_path):
    """FeatureExtractor.testFeatureExtractor evaluates the extractor itself
    with the stock softmax path (TesterFeatureTask parity)."""
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.models.detector import init_detector_params
    from online_detection_tpu.modules.feature_extractor import FeatureExtractor
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth")  # dir name selects the class table
    make_synthetic_icwt(root, n_train=2, n_test=2)
    ds = ICubWorldDataset(root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, 20)
    rng = np.random.default_rng(0)
    params["box_predictor"] = {
        "cls_w": jnp.asarray(rng.normal(0, 0.01, (2048, 20)).astype(np.float32)),
        "cls_b": jnp.zeros((20,)),
        "bbox_w": jnp.asarray(rng.normal(0, 0.001, (2048, 80)).astype(np.float32)),
        "bbox_b": jnp.zeros((80,)),
    }
    fe = FeatureExtractor(dataset=ds, params=params, canvas_hw=(128, 192),
                          min_size=128, max_size=320)
    results = fe.testFeatureExtractor()
    assert any(k.endswith("map_0.5") for k in results)
