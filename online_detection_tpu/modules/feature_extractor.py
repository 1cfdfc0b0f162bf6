"""FeatureExtractor + AccuracyEvaluator facades.

``feature-extractor/feature_extractor.py:10-82`` dispatches to four backends
(RPN-only / detector-only / RPN+detector one-pass / trainer); here they all
route to the jitted harvesting pipeline with the appropriate flags, and the
injected FALKON/RLS models (``falkon_rpn_models`` etc.) become the
``online_rpn`` argument. ``accuracy-evaluator/accuracy_evaluator.py:11-41``
rebuilds the inference model with injected on-line modules and runs the test
loop; here the OnlineModelSet IS the injection.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax

from online_detection_tpu.config.config import build_configs, load_yaml
from online_detection_tpu.models.detector import DetectorConfig, OnlineModelSet
from online_detection_tpu.models.rpn import OnlineRPNModels
from online_detection_tpu.modules import abstract
from online_detection_tpu.pipelines import online_pipeline as pipe


class FeatureExtractor(abstract.FeatureExtractorAbstract):
    """Facade over harvest_dataset; mirrors ``FeatureExtractor``'s public
    methods. Construct with config paths + a dataset + CNN params."""

    def __init__(
        self,
        cfg_path_target_task: Optional[str] = None,
        cfg_online_path: Optional[str] = None,
        dataset=None,
        params=None,
        canvas_hw=None,
        min_size: int = 600,
        max_size: int = 1333,
        seed: int = 0,
    ):
        feat_cfg = load_yaml(cfg_path_target_task) if cfg_path_target_task else {}
        online_cfg = load_yaml(cfg_online_path) if cfg_online_path else {}
        self.train_cfg, self.det_cfg, self.extras = build_configs(feat_cfg, online_cfg)
        self.dataset = dataset
        self.params = params
        self.canvas_hw = canvas_hw
        self.min_size = min_size
        self.max_size = max_size
        self._key = jax.random.key(seed)
        # injection points mirroring the reference's attribute assignment
        # (``run_experiment_online_rpn_ood_oos_serial.py:119-125``)
        self.falkon_rpn_models = None
        self.regressors_rpn_models = None
        self.stats_rpn = None

    def _injected_rpn(self) -> Optional[OnlineRPNModels]:
        if self.falkon_rpn_models is None:
            return None
        return OnlineRPNModels(
            falkon=self.falkon_rpn_models,
            rls=self.regressors_rpn_models,
            stats=self.stats_rpn,
        )

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _harvest(self, cfg, output_dir=None, online_rpn=None):
        return pipe.harvest_dataset(
            self._next_key(), self.params, self.dataset, cfg, self.canvas_hw,
            online_rpn=online_rpn, dcfg=self.det_cfg, output_dir=output_dir,
            min_size=self.min_size, max_size=self.max_size,
        )

    # -- the four reference methods (feature_extractor.py:33-82) ----------

    def extractRPNFeatures(self, is_train=True, output_dir=None, save_features=False):
        cfg = self.train_cfg._replace(with_segmentation=False)
        harvest = self._harvest(cfg, output_dir)
        if save_features and output_dir:
            from online_detection_tpu.utils.checkpoint import save_features as sf

            sf(output_dir, {"rpn": harvest["rpn"]})
        return harvest["rpn"]

    def extractFeatures(self, is_train=True, output_dir=None, save_features=False,
                        extract_features_segmentation=False):
        cfg = self.train_cfg._replace(
            with_rpn=False, with_segmentation=extract_features_segmentation
        )
        harvest = self._harvest(cfg, output_dir, online_rpn=self._injected_rpn())
        if save_features and output_dir:
            from online_detection_tpu.utils.checkpoint import save_features as sf

            sf(output_dir, harvest)
        return harvest

    def extractFeaturesRPNDetector(self, is_train=True, output_dir=None,
                                   save_features=False,
                                   extract_features_segmentation=False):
        cfg = self.train_cfg._replace(
            with_segmentation=extract_features_segmentation
        )
        harvest = self._harvest(cfg, output_dir)
        if save_features and output_dir:
            from online_detection_tpu.utils.checkpoint import save_features as sf

            sf(output_dir, harvest)
        return harvest

    def trainFeatureExtractor(self, output_dir=None, **kw):
        from online_detection_tpu.engine.trainer import SGDConfig, do_train

        cfg = SGDConfig(**kw.get("sgd", {}))
        params, hist = do_train(
            self.params, self.dataset, self.canvas_hw, cfg, self._next_key(),
            with_mask=self.extras.get("mask_on", False),
            time_budget=kw.get("time_budget"),
            min_size=self.min_size, max_size=self.max_size,
        )
        self.params = params
        return params

    def testFeatureExtractor(self, output_dir=None, dataset=None,
                             score_thresh: float = 0.05,
                             nms_thresh: float = 0.5):
        """Evaluate the (pretrained/SGD-trained) extractor itself with the
        stock softmax path — ``TesterFeatureTask``
        (``feature_extractor_tester/test_feature_task.py:66-125``). Returns
        the VOC results dict; also writes result.txt when output_dir given."""
        import jax.numpy as jnp
        import numpy as np

        from online_detection_tpu.data import transforms
        from online_detection_tpu.data.evaluation import voc_eval
        from online_detection_tpu.data.loader import CanvasLoader
        from online_detection_tpu.models.anchors import grid_anchors
        from online_detection_tpu.models.detector import detect_pretrained

        ds = dataset if dataset is not None else self.dataset
        ch, cw = self.canvas_hw
        anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
        mh = self.params.get("mask_head") or {}
        with_masks = bool(self.extras.get("mask_on", False)) and "logits_w" in mh
        jit_detect = jax.jit(
            lambda p, a, im, sz: detect_pretrained(
                p, a, im, sz, self.det_cfg, with_masks=with_masks,
                score_thresh=score_thresh, nms_thresh=nms_thresh,
            )
        )
        predictions, ground_truths = [], []
        with CanvasLoader(ds, self.canvas_hw, self.min_size, self.max_size) as ld:
            for i in range(len(ds)):
                anno = ds.get_annotation(i)
                canvas, scale, (sw, sh) = ld.get(i)
                dets, mask_probs, _, _ = jit_detect(
                    self.params, anchors, jnp.asarray(canvas),
                    jnp.asarray([sw, sh]),
                )
                dets = jax.device_get(dets)
                v = dets.valid
                pred = {
                    "boxes": dets.boxes[v] / scale,
                    "scores": dets.scores[v],
                    "labels": dets.labels[v],
                }
                if with_masks and mask_probs is not None:
                    pred["masks"] = np.asarray(jax.device_get(mask_probs))[v]
                predictions.append(pred)
                gt = {"boxes": anno.boxes, "labels": anno.labels,
                      "difficult": anno.difficult}
                if with_masks:
                    gt["masks"] = ds.load_masks(i, anno)
                ground_truths.append(gt)
        return voc_eval.evaluate(
            predictions, ground_truths, ds.classes,
            iou_thresholds=self.extras.get("iou_thresholds", (0.5,)),
            use_07_metric=self.extras.get("use_07_metric", True),
            evaluate_segmentation=with_masks,
            output_dir=output_dir,
        )


class AccuracyEvaluator(abstract.AccuracyEvaluatorAbstract):
    """Facade over run_inference (``accuracy_evaluator.py`` +
    ``evaluate_accuracy_detector.py:131-196``): the on-line models are passed
    in instead of monkey-patched onto module attributes."""

    def __init__(self, params, dataset, canvas_hw, det_cfg: DetectorConfig,
                 iou_thresholds=(0.5,), use_07_metric=True,
                 min_size=600, max_size=1333):
        self.params = params
        self.dataset = dataset
        self.canvas_hw = canvas_hw
        self.det_cfg = det_cfg
        self.iou_thresholds = iou_thresholds
        self.use_07_metric = use_07_metric
        self.min_size = min_size
        self.max_size = max_size

    def evaluate(self, online: OnlineModelSet, output_dir=None,
                 evaluate_segmentation=True):
        return self.evaluateAccuracyDetection(
            online, output_dir=output_dir,
            evaluate_segmentation=evaluate_segmentation,
        )

    def evaluateAccuracyDetection(self, online: OnlineModelSet, is_train=False,
                                  output_dir=None, evaluate_segmentation=True,
                                  **_):
        results, predictions = pipe.run_inference(
            self.params, online, self.dataset, self.canvas_hw, self.det_cfg,
            with_masks=evaluate_segmentation,
            output_dir=output_dir,
            iou_thresholds=self.iou_thresholds,
            use_07_metric=self.use_07_metric,
            min_size=self.min_size, max_size=self.max_size,
        )
        return results
