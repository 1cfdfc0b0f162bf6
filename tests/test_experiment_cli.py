"""Smoke test of the flagship experiment CLI on the synthetic dataset with
reference-format YAML configs written on the fly."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

from tests.fixtures import make_synthetic_icwt


FEAT_CFG = """
MODEL:
  WEIGHT: ""
  RPN:
    PRE_NMS_TOP_N_TEST: 150
    POST_NMS_TOP_N_TEST: 40
  MASK_ON: True
DATASETS:
  TRAIN: ("path:{root}::train",)
  TEST: ("path:{root}::test",)
INPUT:
  MIN_SIZE_TEST: 128
  MAX_SIZE_TEST: 320
MINIBOOTSTRAP:
  DETECTOR:
    NUM_CLASSES: 19
    ITERATIONS: 2
    BATCH_SIZE: 64
    SHUFFLE_NEGATIVES: True
SEGMENTATION:
  BATCH_SIZE: 256
EVALUATION:
  IOU_THRESHOLDS: (0.5,)
  USE_VOC07_METRIC: True
"""

ONLINE_CFG = """
NUM_CLASSES: 20
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


def test_flagship_experiment_cli(tmp_path):
    # Note: CHOSEN_CLASSES left minimal -> falls back to MINIBOOTSTRAP
    # NUM_CLASSES like the reference's no-config default path.
    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=4, n_test=3)
    feat_path = tmp_path / "feat.yaml"
    feat_path.write_text(FEAT_CFG.format(root=root))
    online_path = tmp_path / "online.yaml"
    online_path.write_text(ONLINE_CFG)
    out_dir = str(tmp_path / "out")

    import run_experiment_online_rpn_ood_oos as exp

    results = exp.main(
        [
            "--output_dir", out_dir,
            "--config_file_feature_extraction", str(feat_path),
            "--config_file_online_rpn_detection_segmentation", str(online_path),
            "--save_RPN_detector_segmentation_models",
            "--CPU",
        ]
    )
    assert "det_map_0.5" in results
    # the models must actually LEARN at smoke scale (deterministic fixture;
    # CPU run measures 0.886/0.886 — the loose floor absorbs numeric drift).
    # Regression guard: an indefinite f32 Gram once NaN'd the RPN refiner and
    # zeroed every proposal, and box-filling GT masks gave the per-pixel mask
    # heads zero negatives — both showed up only as silent mAP 0.0 here.
    assert results["det_map_0.5"] > 0.3
    assert results["segm_map_0.5"] > 0.3
    assert os.path.exists(os.path.join(out_dir, "result.txt"))
    assert os.path.exists(os.path.join(out_dir, "classifier_detector.npz"))
    assert os.path.exists(os.path.join(out_dir, "classifier_rpn.npz"))
    assert os.path.exists(os.path.join(out_dir, "classifier_segmentation.npz"))

    # reload path: --load models and re-evaluate without retraining
    results2 = exp.main(
        [
            "--output_dir", out_dir,
            "--config_file_feature_extraction", str(feat_path),
            "--config_file_online_rpn_detection_segmentation", str(online_path),
            "--load_RPN_detector_segmentation_models",
            "--CPU",
        ]
    )
    np.testing.assert_allclose(
        results["det_map_0.5"], results2["det_map_0.5"], atol=1e-6
    )
