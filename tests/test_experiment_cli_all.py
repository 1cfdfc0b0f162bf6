"""Smoke tests for the six non-flagship experiment CLIs on the synthetic
dataset (VERDICT round 1, item 8): serial, ood --no_rpn, segmentation
--eval_segm_with_gt_bboxes, full-train (3 iters), fine-tune
(--train_for_time + --use_backbone_features), and the checkpoint tester.

All CLIs run in-process with the SAME tiny configs as the flagship CLI test,
so the jitted harvest/detect programs are shared across tests.
"""

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
    POST_NMS_TOP_N_TRAIN: 30
  ROI_HEADS:
    BATCH_SIZE_PER_IMAGE: 32
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
# small SGD shapes aligned with tests/test_trainer.py so the baseline CLIs
# reuse its compiled train-step program (1-core sandbox: compiles dominate)
SOLVER:
  BASE_LR: 0.005
  WARMUP_ITERS: 0
  STEPS: (48000, 64000)
  WEIGHT_DECAY: 0.0005
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


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_all")
    root = str(base / "ycbv_synth")
    make_synthetic_icwt(root, n_train=3, n_test=2)
    feat = base / "feat.yaml"
    feat.write_text(FEAT_CFG.format(root=root))
    # mask-off variant for the SGD baseline CLIs: the mask forward+backward
    # is covered by tests/test_trainer.py; dropping it halves their compiles
    feat_nomask = base / "feat_nomask.yaml"
    feat_nomask.write_text(
        FEAT_CFG.format(root=root).replace("MASK_ON: True", "MASK_ON: False")
    )
    online = base / "online.yaml"
    online.write_text(ONLINE_CFG)
    return {"base": base, "feat": str(feat), "feat_nomask": str(feat_nomask),
            "online": str(online)}


def test_serial_cli(synth):
    import run_experiment_online_rpn_ood_oos_serial as exp

    out = str(synth["base"] / "out_serial")
    results = exp.main([
        "--output_dir", out,
        "--config_file_feature_extraction", synth["feat"],
        "--config_file_online_rpn_detection_segmentation", synth["online"],
        "--CPU",
    ])
    assert any(k.endswith("map_0.5") for k in results)
    txt = open(os.path.join(out, "result.txt")).read()
    assert "RPN's Online Classifier training time" in txt
    assert "Average Recall (AR):" in txt  # written at harvest time


def test_ood_cli_no_rpn(synth):
    import run_experiment_online_rpn_ood as exp

    out = str(synth["base"] / "out_ood")
    results = exp.main([
        "--output_dir", out,
        "--config_file_feature_extraction", synth["feat"],
        "--config_file_rpn_detection", synth["online"],
        "--no_rpn", "--CPU",
    ])
    assert any(k.endswith("map_0.5") for k in results)
    # --no_rpn: no O-RPN stage timings written
    txt = open(os.path.join(out, "result.txt")).read()
    assert "RPN's Online Classifier" not in txt


def test_segmentation_cli_gt_bboxes(synth):
    import run_experiment_segmentation as exp

    out = str(synth["base"] / "out_segm")
    results = exp.main([
        "--output_dir", out,
        "--config_file_feature_extraction", synth["feat"],
        "--config_file_online_detection_segmentation", synth["online"],
        "--eval_segm_with_gt_bboxes", "--CPU",
    ])
    # GT-box substitution -> detection mAP vs GT boxes is exact by design
    assert results.get("det_map_0.5", 0.0) > 0.99
    assert "segm_map_0.5" in results


def test_full_train_cli(synth):
    import run_experiment_full_train as exp

    out = str(synth["base"] / "out_full")
    params = exp.main([
        "--output_dir", out,
        "--config_file", synth["feat"],
        "--max_iter", "3", "--CPU",
    ])
    assert params is not None
    assert os.path.exists(os.path.join(out, "model_final.pkl"))
    hist = np.load(os.path.join(out, "loss_history.npy"))
    assert len(hist) == 3 and np.isfinite(hist).all()


def test_fine_tuning_and_tester_cli(synth):
    import run_experiment_fine_tuning as ft
    import run_experiment_test_feature_task as tester

    out = str(synth["base"] / "out_ft")
    params = ft.main([
        "--output_dir", out,
        "--config_file", synth["feat_nomask"],
        "--train_for_time", "0h:0m:20s",
        "--max_iter", "2",
        "--use_backbone_features", "--CPU",
    ])
    assert params is not None
    ckpt = os.path.join(out, "model_final.pkl")
    assert os.path.exists(ckpt)
    assert os.path.isdir(os.path.join(out, "features"))  # backbone cache used

    results = tester.main([
        "--output_dir", str(synth["base"] / "out_tester"),
        "--models_dir", out,
        "--config_file", synth["feat_nomask"],
        "--CPU",
    ])
    assert ckpt in results
    assert any("map" in k for k in results[ckpt])


def test_visualizer_cli(synth):
    """Visualizer CLI: save models with the flagship CLI, then overlay PNGs."""
    import run_experiment_online_rpn_ood_oos as flagship
    import visualize_masks_online_segmentation as viz

    out = str(synth["base"] / "out_viz_models")
    flagship.main([
        "--output_dir", out,
        "--config_file_feature_extraction", synth["feat"],
        "--config_file_online_rpn_detection_segmentation", synth["online"],
        "--save_RPN_detector_segmentation_models", "--CPU",
    ])
    viz_out = str(synth["base"] / "out_viz")
    viz.main([
        "--models_dir", out,
        "--output_dir", viz_out,
        "--config_file_feature_extraction", synth["feat"],
        "--num_images", "1", "--CPU",
    ])
    pngs = [f for f in os.listdir(viz_out) if f.endswith(".png")]
    assert pngs, "no overlays written"
