"""All 32 shipped experiment configs load through build_configs with the
reference's hyperparameters, and config resolution fails loudly.

Reference: the 32 YAMLs under /root/reference experiments/configs (SURVEY.md
§5 "Config / flag system") — their values are the reproducibility contract.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

from online_detection_tpu.config.config import build_configs, load_yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "experiments", "configs")

ALL_CONFIGS = sorted(
    f for f in os.listdir(CONFIG_DIR) if f.endswith(".yaml")
)

FEAT_FAMILY = tuple(
    f for f in ALL_CONFIGS
    if f.startswith(
        ("config_feature_extraction", "config_detector", "config_rpn_",
         "config_fine_tuning", "config_full_train")
    )
)
ONLINE_FAMILY = tuple(f for f in ALL_CONFIGS if f.startswith("config_online"))


def test_all_32_configs_present():
    assert len(ALL_CONFIGS) == 32
    assert len(FEAT_FAMILY) + len(ONLINE_FAMILY) == 32


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_loads_through_build_configs(name):
    cfg = load_yaml(os.path.join(CONFIG_DIR, name))
    assert isinstance(cfg, dict) and cfg
    if name in ONLINE_FAMILY:
        train_cfg, det_cfg, extras = build_configs({}, cfg)
    else:
        train_cfg, det_cfg, extras = build_configs(cfg, {})
        assert extras["train_datasets"], name
        assert extras["test_datasets"], name
    assert train_cfg.num_classes >= 1
    assert det_cfg.detections_per_img >= 1


def test_cli_default_config_names_exist():
    # every experiment CLI's default --config_file* must resolve (the serial
    # variant's defaults were missing in round 1 and fell back silently)
    defaults = [
        "config_fine_tuning_ycbv.yaml",
        "config_full_train_ycbv.yaml",
        "config_rpn_icwt30.yaml",
        "config_online_rpn_online_detection_icwt30.yaml",
        "config_feature_extraction_online_rpn_det_segm_ycbv.yaml",
        "config_online_rpn_detection_segmentation_ycbv.yaml",
        "config_feature_extraction_online_rpn_det_segm_ycbv_serial.yaml",
        "config_online_rpn_detection_segmentation_ycbv_serial.yaml",
        "config_feature_extraction_segmentation_ycbv.yaml",
        "config_online_detection_segmentation_ycbv.yaml",
    ]
    for name in defaults:
        assert os.path.exists(os.path.join(CONFIG_DIR, name)), name


def test_resolve_config_raises_on_missing():
    from _common import resolve_config

    with pytest.raises(FileNotFoundError):
        resolve_config("config_does_not_exist.yaml")
    assert resolve_config("") is None
    assert resolve_config(None) is None
    got = resolve_config("config_rpn_ycbv.yaml")
    assert got and os.path.exists(got)


def test_flagship_ycbv_hyperparameters():
    feat = load_yaml(os.path.join(
        CONFIG_DIR, "config_feature_extraction_online_rpn_det_segm_ycbv.yaml"))
    online = load_yaml(os.path.join(
        CONFIG_DIR, "config_online_rpn_detection_segmentation_ycbv.yaml"))
    train_cfg, det_cfg, extras = build_configs(feat, online)
    # SURVEY.md §2.4 contract numbers
    assert train_cfg.num_classes == 21
    assert (train_cfg.det_sigma, train_cfg.det_lam, train_cfg.det_m) == (15, 1e-5, 1000)
    assert (train_cfg.rpn_sigma, train_cfg.rpn_lam, train_cfg.rpn_m) == (50, 1e-3, 1000)
    assert (train_cfg.segm_sigma, train_cfg.segm_lam, train_cfg.segm_m) == (10, 1e-6, 500)
    assert (train_cfg.det_reg_lam, train_cfg.rpn_reg_lam) == (1000.0, 0.01)
    assert (train_cfg.iterations, train_cfg.batch_size) == (10, 2000)
    assert det_cfg.score_thresh == -2.0 and det_cfg.nms_thresh == 0.3
    assert extras["iou_thresholds"] == (0.5, 0.7)
    assert extras["mask_on"] is True
    assert extras["shuffle_negatives"] is True
    assert extras["class_names"][0] == "_background_"
    assert len(extras["class_names"]) == 22


def test_icwt30_hyperparameters_differ_from_ycbv():
    # round 1 shipped the YCBV values under the iCWT-30 name; the reference
    # uses M=2000, sigma=20, lambda=1e-3 (detector) and lambda=1e-5 (RPN)
    online = load_yaml(os.path.join(
        CONFIG_DIR, "config_online_rpn_online_detection_icwt30.yaml"))
    train_cfg, _, extras = build_configs({}, online)
    assert train_cfg.num_classes == 30
    assert (train_cfg.det_sigma, train_cfg.det_lam, train_cfg.det_m) == (20, 1e-3, 2000)
    assert train_cfg.rpn_lam == 1e-5
    assert len(extras["class_names"]) == 31


def test_serial_ycbv_segmentation_hyperparameters():
    online = load_yaml(os.path.join(
        CONFIG_DIR, "config_online_rpn_detection_segmentation_ycbv_serial.yaml"))
    train_cfg, _, _ = build_configs({}, online)
    assert (train_cfg.det_sigma, train_cfg.segm_sigma) == (10, 25)
    assert train_cfg.segm_lam == 1e-7
    feat = load_yaml(os.path.join(
        CONFIG_DIR, "config_feature_extraction_online_rpn_det_segm_ycbv_serial.yaml"))
    t2, _, _ = build_configs(feat, online)
    assert t2.iterations == 8  # serial runs 8 minibootstrap iterations
