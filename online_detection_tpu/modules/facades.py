"""API-parity facades: the reference's four public module classes
(SURVEY.md §1 L2), implemented over the functional TPU internals.

A user of the reference can keep their orchestration code shape:

    fe = FeatureExtractor(cfg_feat_path, cfg_online_path)
    feats = fe.extractFeaturesRPNDetector(is_train=True, ...)
    classifier = FALKONWrapper(cfg_online_path)
    oc = OnlineRegionClassifier(classifier, positives, negatives, stats, ...)
    models = oc.trainRegionClassifier(output_dir=...)
    refiner = RegionRefiner(cfg_online_path)
    regs = refiner.trainRegionRefiner(COXY, output_dir=...)
    evaluator = AccuracyEvaluator(...); evaluator.evaluateAccuracyDetection(...)

Internally everything routes to the jitted pipelines: classes hold config +
trained state; compute stays in pure functions.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.config.config import build_configs, load_yaml
from online_detection_tpu.modules import abstract
from online_detection_tpu.ops.gaussian_mmv import mmv
from online_detection_tpu.solvers.falkon import (
    FalkonModel,
    falkon_fit,
    select_nystrom_centers,
)
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)
from online_detection_tpu.solvers.rls import RLSModel, rls_fit
from online_detection_tpu.utils.stats import FeatureStats, zscore


class FALKONWrapper(abstract.ClassifierAbstract):
    """``FALKONWrapper_with_centers_selection.py:16-95``: builds/uses one
    Gaussian-kernel FALKON model per call, with the <=M/2-positives Nystrom
    center selection."""

    def __init__(self, cfg_path=None, is_rpn=False, is_segmentation=False):
        opts = {}
        if cfg_path is not None:
            cfg = load_yaml(cfg_path)
            if is_rpn:
                cfg = cfg.get("RPN", cfg)
            key = "ONLINE_SEGMENTATION" if is_segmentation else "ONLINE_REGION_CLASSIFIER"
            opts = cfg.get(key, {}).get("CLASSIFIER", {})
        self.sigma = opts.get("sigma", 5)
        self.lam = opts.get("lambda", 0.001)
        self.nyst_centers = opts.get("M", 1000)
        self._key = jax.random.key(0)

    def train(self, X, y, sigma=None, lam=None):
        sigma = self.sigma if sigma is None else sigma
        lam = self.lam if lam is None else lam
        X = jnp.asarray(np.asarray(X, np.float32))
        y = jnp.asarray(np.asarray(y, np.float32))
        self._key, sub = jax.random.split(self._key)
        idx = select_nystrom_centers(
            sub, y > 0, jnp.ones(y.shape[0], bool), self.nyst_centers
        )
        centers = X[idx]
        alpha = falkon_fit(
            X, y, jnp.ones(y.shape[0]), centers, float(sigma), float(lam)
        )
        return FalkonModel(centers, alpha, jnp.asarray(True), float(sigma))

    def predict(self, model: FalkonModel, X, y=None):
        X = jnp.asarray(np.asarray(X, np.float32))
        return mmv(X, model.centers, model.alpha, model.sigma)

    def test(self):  # parity no-op (reference stub)
        pass


class OnlineRegionClassifier(abstract.RegionClassifierAbstract):
    """``OnlineRegionClassifier.py:19-227`` over the vmapped minibootstrap.

    positives: list per class of [n_i, d] arrays; negatives: list per class
    of per-batch arrays (the reference's layout). Training converts them to
    the fixed-capacity masked buffers and runs all classes concurrently.
    """

    def __init__(self, classifier: FALKONWrapper, positives, negatives, stats,
                 cfg_path=None, is_rpn=False, is_segmentation=False):
        self.classifier = classifier
        self.positives = positives
        self.negatives = negatives
        cfg = load_yaml(cfg_path) if cfg_path else {}
        if is_rpn:
            cfg = cfg.get("RPN", cfg)
        sect = cfg.get(
            "ONLINE_SEGMENTATION" if is_segmentation else "ONLINE_REGION_CLASSIFIER",
            {},
        )
        self.hard_tresh = sect.get("MINIBOOTSTRAP", {}).get("HARD_THRESH", -0.7)
        self.easy_tresh = sect.get("MINIBOOTSTRAP", {}).get("EASY_THRESH", -0.9)
        self.lam = sect.get("CLASSIFIER", {}).get("lambda", classifier.lam)
        self.sigma = sect.get("CLASSIFIER", {}).get("sigma", classifier.sigma)
        if isinstance(stats, dict):
            stats = FeatureStats(
                jnp.asarray(stats["mean"]), jnp.asarray(stats["std"]),
                jnp.asarray(stats["mean_norm"]),
            )
        self.stats = stats
        self.num_classes = len(positives)
        self.models: Optional[FalkonModel] = None

    def _to_buffers(self):
        c = self.num_classes
        d = None
        for p in self.positives:
            if len(p):
                d = np.asarray(p).shape[1]
                break
        if d is None:
            for nb in self.negatives:
                for b in nb:
                    if len(b):
                        d = np.asarray(b).shape[1]
                        break
        p_cap = max(1, max((len(p) for p in self.positives), default=1))
        n_iter = max(1, max((len(n) for n in self.negatives), default=1))
        b_cap = max(
            [1] + [len(b) for nb in self.negatives for b in nb]
        )
        pos = np.zeros((c, p_cap, d), np.float32)
        pv = np.zeros((c, p_cap), bool)
        neg = np.zeros((c, n_iter, b_cap, d), np.float32)
        nv = np.zeros((c, n_iter, b_cap), bool)
        for i in range(c):
            n = len(self.positives[i])
            if n:
                pos[i, :n] = np.asarray(self.positives[i])
                pv[i, :n] = True
            for b, rows in enumerate(self.negatives[i]):
                if len(rows):
                    neg[i, b, : len(rows)] = np.asarray(rows)
                    nv[i, b, : len(rows)] = True
        return pos, pv, neg, nv

    def zScores(self, feat, target_norm=20):
        return zscore(jnp.asarray(feat), self.stats, target_norm)

    def trainRegionClassifier(self, opts=None, output_dir=None):
        import time

        pos, pv, neg, nv = self._to_buffers()
        pos = np.asarray(self.zScores(pos)) * pv[..., None]
        neg = np.asarray(self.zScores(neg)) * nv[..., None]
        t0 = time.time()
        self.models = train_classifiers_minibootstrap(
            jax.random.key(0),
            jnp.asarray(pos), jnp.asarray(pv), jnp.asarray(neg), jnp.asarray(nv),
            MinibootstrapParams(
                m=self.classifier.nyst_centers, sigma=float(self.sigma),
                lam=float(self.lam), hard_thresh=self.hard_tresh,
                easy_thresh=self.easy_tresh,
            ),
        )
        if output_dir:
            dt = time.time() - t0
            with open(os.path.join(output_dir, "result.txt"), "a") as fid:
                fid.write(
                    "Online Classifier training time: {}min:{}s \n".format(
                        int(dt / 60), round(dt % 60)
                    )
                )
        return self.models

    def updateModel(self, cache: Dict) -> FalkonModel:
        """Retrain one class's FALKON from a {pos, neg} cache
        (``OnlineRegionClassifier.py:81-94``) — the public incremental-
        retraining surface; also the per-step primitive of the facade's
        minibootstrap and the IncrementalTeacher demo."""
        x_pos = np.asarray(cache["pos"], np.float32)
        x_neg = np.asarray(cache["neg"], np.float32)
        x = np.concatenate([x_pos, x_neg], axis=0)
        y = np.concatenate(
            [np.ones(len(x_pos), np.float32), -np.ones(len(x_neg), np.float32)]
        )
        return self.classifier.train(x, y, sigma=self.sigma, lam=self.lam)

    def testRegionClassifier(self, model: FalkonModel, test_boxes: List[Dict]):
        """Score cached test_boxes (``OnlineRegionClassifier.py:182-219``):
        per image, z-score the non-GT rows and emit [N, C+1] scores with
        background -1."""
        from online_detection_tpu.solvers.falkon import falkon_predict_classes

        predictions = []
        for entry in test_boxes:
            if entry is None:
                continue
            keep = ~np.asarray(entry["gt"]).astype(bool).reshape(-1)
            feats = jnp.asarray(np.asarray(entry["feat"])[keep])
            feats = self.zScores(feats)
            scores = np.asarray(falkon_predict_classes(model, feats))
            out = -np.ones((scores.shape[0], self.num_classes + 1), np.float32)
            out[:, 1:] = scores
            predictions.append(
                {
                    "boxes": np.asarray(entry["boxes"])[keep],
                    "scores": out,
                    "img_size": entry["img_size"],
                }
            )
        return predictions

    def predict(self, dataset):  # parity stub (reference leaves it empty)
        pass


class RegionRefiner(abstract.RegionRefinerAbstract):
    """``region-refiner/region_refiner.py:8-36`` + trainer + predictor."""

    def __init__(self, cfg_path=None, is_rpn=False):
        cfg = load_yaml(cfg_path) if cfg_path else {}
        if is_rpn:
            cfg = cfg.get("RPN", cfg)
        self.lam = float(cfg.get("REGION_REFINER", {}).get("opts", {}).get("lambda", 1000))
        self.num_classes = len(cfg.get("CHOSEN_CLASSES", {})) - 1 if cfg.get("CHOSEN_CLASSES") else None
        self.is_rpn = is_rpn
        self.models: Optional[RLSModel] = None

    def trainRegionRefiner(self, COXY: Dict, output_dir=None):
        import time

        x = np.asarray(COXY["X"], np.float32)
        y = np.asarray(COXY["Y"], np.float32)
        c = np.asarray(COXY["C"]).reshape(-1).astype(int)
        if self.is_rpn:
            classes = sorted(set(c.tolist())) or [0]
            n_cls = max(classes) + 1
            base = 0
        else:
            n_cls = self.num_classes or int(c.max()) if len(c) else 1
            base = 1
        cap = max(1, max((int((c == base + i).sum()) for i in range(n_cls)), default=1))
        d = x.shape[1] if len(x) else 1
        xb = np.zeros((n_cls, cap, d), np.float32)
        yb = np.zeros((n_cls, cap, 4), np.float32)
        w = np.zeros((n_cls, cap), np.float32)
        for i in range(n_cls):
            rows = c == base + i
            n = min(int(rows.sum()), cap)
            if n:
                xb[i, :n] = x[rows][:n]
                yb[i, :n] = y[rows][:n]
                w[i, :n] = 1.0
        t0 = time.time()
        self.models = rls_fit(jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(w), self.lam)
        if output_dir:
            dt = time.time() - t0
            name = "RPN's " if self.is_rpn else "Detector's "
            with open(os.path.join(output_dir, "result.txt"), "a") as fid:
                fid.write(
                    name + "Online Region Refiner training time: {}min:{}s \n".format(
                        int(dt / 60), round(dt % 60)
                    )
                )
        return self.models

    def predict(self, boxes: np.ndarray, features: np.ndarray, image_size):
        """``region_predictor/predict_regions.py:16-80``: apply each class's
        refiner and decode/clip the boxes."""
        from online_detection_tpu.solvers.rls import rls_predict
        from online_detection_tpu.utils import boxes as box_ops

        deltas = rls_predict(self.models, jnp.asarray(features))  # [N, C, 4]
        n, c = deltas.shape[0], deltas.shape[1]
        flat = deltas.reshape(n, c * 4)
        # the standalone predictor decodes with the eps width convention and
        # the one-sided clamp (``predict_regions.py:55-70``)
        decoded = box_ops.decode_boxes(
            flat, jnp.asarray(boxes), clip_exp=False,
            src_size_offset=float(np.spacing(1)),
        )
        return np.asarray(box_ops.clip_boxes_one_sided(decoded, image_size))


class AccuracyEvaluatorStandalone:
    """``accuracy-evaluator/AccuracyEvaluator.py:11-43`` — the STANDALONE
    evaluator of the cached-test_boxes experiments (``run_experiment_online_
    rpn_ood.py:204-215``): applies the standalone postprocessor
    (``OnlineDetectionPostProcessor_standalone.py``) to refined predictions
    (``testRegionClassifier`` scores + ``RegionPredictor`` boxes) and runs
    the VOC evaluator on the survivors.

    ``predictions``: per-image dicts with ``boxes`` [N, (C+1)*4] (class 0 =
    raw boxes, the ``predict_regions.py:74-77`` layout), ``scores``
    [N, C+1], ``img_size`` (w, h). ``ground_truths``: the voc_eval dicts.
    """

    def __init__(self, cfg_path=None, output_folder=None):
        cfg = load_yaml(cfg_path) if cfg_path else {}
        ev = cfg.get("EVALUATION", {})
        self.score_thresh = float(ev.get("SCORE_THRESH", -2.0))
        self.nms = float(ev.get("NMS", 0.3))
        self.detections_per_img = int(ev.get("DETECTIONS_PER_IMAGE", 100))
        self.class_names = cfg.get("CHOSEN_CLASSES")
        self.output_folder = output_folder

    def postprocess(self, predictions):
        from online_detection_tpu.models.postprocess import (
            postprocess_detections_standalone,
        )

        out = []
        for p in predictions:
            boxes = np.asarray(p["boxes"], np.float32)
            scores = np.asarray(p["scores"], np.float32)
            if boxes.ndim == 3:  # [N, C+1, 4] -> [N, (C+1)*4]
                boxes = boxes.reshape(boxes.shape[0], -1)
            dets = postprocess_detections_standalone(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.ones((boxes.shape[0],), bool), tuple(p["img_size"]),
                score_thresh=self.score_thresh, nms_thresh=self.nms,
                detections_per_img=self.detections_per_img,
            )
            keep = np.asarray(dets.valid)
            out.append(
                {
                    "boxes": np.asarray(dets.boxes)[keep],
                    "scores": np.asarray(dets.scores)[keep],
                    "labels": np.asarray(dets.labels)[keep],
                }
            )
        return out

    def evaluate(self, ground_truths, predictions, iou_thresholds=(0.5,),
                 use_07_metric=True, class_names=None, **_):
        from online_detection_tpu.data.evaluation import voc_eval

        names = class_names or self.class_names or [
            str(i) for i in range(np.asarray(predictions[0]["scores"]).shape[1])
        ]
        return voc_eval.evaluate(
            self.postprocess(predictions), ground_truths, names,
            iou_thresholds=iou_thresholds, use_07_metric=use_07_metric,
            output_dir=self.output_folder,
        )
