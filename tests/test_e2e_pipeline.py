"""The minimum end-to-end slice (SURVEY.md §7): synthetic iCWT-format data
-> harvest -> FALKON/RLS training -> inference -> VOC mAP, hermetically on
the CPU mesh with random CNN weights and tiny solver sizes."""

import jax
import numpy as np
import pytest

from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.models.detector import DetectorConfig, init_detector_params
from online_detection_tpu.pipelines.online_pipeline import (
    OnlineTrainConfig,
    harvest_dataset,
    run_inference,
    train_online_modules,
)
from tests.fixtures import make_synthetic_icwt

CANVAS = (128, 192)  # 240x320 images at min_size=128 -> 128x171, /32 pad
MIN_SIZE, MAX_SIZE = 128, 320


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data") / "ycbv_synth")
    make_synthetic_icwt(root, n_train=6, n_test=4)
    return root


def test_end_to_end_online_pipeline(synth_root, tmp_path):
    train_ds = ICubWorldDataset(synth_root, "Main", "train")
    test_ds = ICubWorldDataset(synth_root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, 20)
    out_dir = str(tmp_path / "out")

    cfg = OnlineTrainConfig(
        num_classes=19,  # YCBV class table
        det_m=32, rpn_m=32, segm_m=32,
        iterations=2, batch_size=64, segm_batch_size=256,
    )
    dcfg = DetectorConfig(pre_nms_top_n=200, post_nms_top_n=50, detections_per_img=10)

    harvest = harvest_dataset(
        jax.random.key(1), params, train_ds, cfg, CANVAS,
        dcfg=dcfg, gt_cap=4, output_dir=out_dir,
        min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    assert harvest["rpn"]["neg"].shape[:1] == (15,)
    assert harvest["det"]["neg"].shape == (19, 2, 64, 2048)
    # the two present classes collected positives and COXY rows
    present = {10, 13}  # 011_banana, 025_mug in the YCBV table
    for c in present:
        assert harvest["det"]["pos_valid"][c - 1].sum() > 0
    assert set(np.unique(harvest["det"]["coxy"]["C"]).astype(int)) <= present
    assert harvest["average_recall"] >= 0.0

    online = train_online_modules(jax.random.key(2), harvest, cfg, out_dir)
    assert bool(online.detector.falkon.exists[9]) and bool(online.detector.falkon.exists[12])
    assert not bool(online.detector.falkon.exists[0])  # absent class
    assert online.rpn is not None and online.mask is not None

    results, predictions = run_inference(
        params, online, test_ds, CANVAS, dcfg,
        output_dir=out_dir, min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    assert "det_map_0.5" in results and "segm_map_0.5" in results
    assert len(predictions) == len(test_ds)
    # result.txt carries the reference's block structure
    txt = open(out_dir + "/result.txt").read()
    for needle in (
        "features extracted",
        "RPN's Online Classifier training time",
        "Detector's Online Classifier training time",
        "Online Segmentation training time",
        "Detection mAP50",
        "Segmentation mAP50",
        "Average image testing time",
    ):
        assert needle in txt, needle
    print("e2e det mAP@0.5:", results["det_map_0.5"],
          "segm mAP@0.5:", results["segm_map_0.5"])
