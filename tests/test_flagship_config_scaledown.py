"""Flagship-config execution test (VERDICT round 1, item 7): the REAL shipped
YCBV YAML pair is projected through ``config/config.py:build_configs`` — the
knobs asserted at their true production values — then the pipeline runs
end-to-end on synthetic data with ONLY the solver sizes shrunk through the
documented override mechanisms (the ``--minibootstrap_iterations``-equivalent
argument and ``OnlineTrainConfig._replace``, the same mechanism the CLIs use
for their flag overrides). This catches config->pipeline projection bugs the
hand-written tiny test YAMLs cannot."""

import os

import jax
import numpy as np
import pytest

from online_detection_tpu.config.config import build_configs, load_yaml
from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.models.detector import init_detector_params
from online_detection_tpu.pipelines.online_pipeline import (
    harvest_dataset,
    run_inference,
    train_online_modules,
)
from tests.fixtures import make_synthetic_icwt

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "experiments", "configs")
CANVAS = (128, 192)
MIN_SIZE, MAX_SIZE = 128, 320


def test_flagship_ycbv_config_projection_and_execution(tmp_path):
    feat_cfg = load_yaml(
        os.path.join(CONFIGS, "config_feature_extraction_online_rpn_det_segm_ycbv.yaml")
    )
    online_cfg = load_yaml(
        os.path.join(CONFIGS, "config_online_rpn_detection_segmentation_ycbv.yaml")
    )
    # projection at TRUE knob values, with the CLI's --minibootstrap_iterations
    # override applied exactly as run_experiment_online_rpn_ood_oos does
    train_cfg, det_cfg, extras = build_configs(feat_cfg, online_cfg, 2)
    assert train_cfg.num_classes == 21
    assert train_cfg.det_m == 1000 and train_cfg.det_sigma == 15 and train_cfg.det_lam == 1e-5
    assert train_cfg.rpn_m == 1000 and train_cfg.rpn_sigma == 50 and train_cfg.rpn_lam == 1e-3
    assert train_cfg.segm_m == 500 and train_cfg.segm_sigma == 10 and train_cfg.segm_lam == 1e-6
    assert train_cfg.det_reg_lam == 1000.0 and train_cfg.rpn_reg_lam == 0.01
    assert train_cfg.batch_size == 2000  # the 10x2000 pools (iterations overridden to 2)
    assert train_cfg.iterations == 2
    assert train_cfg.hard_thresh == -0.7 and train_cfg.easy_thresh == -0.9
    assert train_cfg.segm_batch_size == 20000
    assert train_cfg.shuffle_negatives and train_cfg.rpn_shuffle_negatives
    assert det_cfg.pre_nms_top_n == 1000 and det_cfg.post_nms_top_n == 300
    assert det_cfg.score_thresh == -2.0 and det_cfg.nms_thresh == 0.3
    assert det_cfg.detections_per_img == 100
    assert extras["min_size_test"] == 600 and extras["max_size_test"] == 1333
    assert tuple(extras["iou_thresholds"]) == (0.5, 0.7)
    assert len(extras["class_names"]) == 22  # __background__ + 21

    # without the CLI override the shipped value is the paper's 10 iterations
    full_cfg, _, _ = build_configs(feat_cfg, online_cfg, None)
    assert full_cfg.iterations == 10

    # scaled-down EXECUTION of the projected config: only solver sizes shrunk
    # (the documented programmatic override; everything else — class count,
    # sigmas, lambdas, thresholds, shuffle regimes — stays at shipped values)
    run_cfg = train_cfg._replace(
        det_m=16, rpn_m=16, segm_m=16, batch_size=48, segm_batch_size=192,
    )
    dcfg = det_cfg._replace(
        pre_nms_top_n=200, post_nms_top_n=40, detections_per_img=10
    )
    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=4, n_test=2)
    train_ds = ICubWorldDataset(root, "Main", "train")
    test_ds = ICubWorldDataset(root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, run_cfg.num_classes + 1)
    out_dir = str(tmp_path / "out")

    harvest = harvest_dataset(
        jax.random.key(1), params, train_ds, run_cfg, CANVAS,
        dcfg=dcfg, gt_cap=4, output_dir=out_dir,
        min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    assert harvest["det"]["neg"].shape[:3] == (21, 2, 48)
    online = train_online_modules(jax.random.key(2), harvest, run_cfg, out_dir)
    assert online.rpn is not None and online.mask is not None
    results, _ = run_inference(
        params, online, test_ds, CANVAS, dcfg,
        output_dir=out_dir,
        iou_thresholds=extras["iou_thresholds"],
        use_07_metric=extras["use_07_metric"],
        min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    assert "det_map_0.5" in results
    txt = open(os.path.join(out_dir, "result.txt")).read()
    assert "Detector's Online Classifier training time" in txt