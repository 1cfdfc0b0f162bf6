"""YCB-Video BOP-format reader test on a fabricated scene."""

import json
import os

import numpy as np
import pytest

from online_detection_tpu.data.datasets.ycb_video import (
    YCBV_CLASSES,
    YCBVideoDataset,
)


@pytest.fixture
def bop_root(tmp_path):
    from PIL import Image

    root = tmp_path / "YCB-Video" / "test"
    scene = root / "000048"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask_visib").mkdir()
    rng = np.random.default_rng(0)

    scene_gt = {
        "1": [
            {"obj_id": 2},           # 003_cracker_box
            {"obj_id": 10},          # 011_banana
            {"obj_id": 5},           # 006_mustard_bottle (invisible)
        ]
    }
    scene_gt_info = {
        "1": [
            {"bbox_visib": [100, 80, 60, 40]},
            {"bbox_visib": [300, 200, 50, 70]},
            {"bbox_visib": [-1, -1, -1, -1]},
        ]
    }
    (scene / "scene_gt.json").write_text(json.dumps(scene_gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(scene_gt_info))
    Image.fromarray(
        rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    ).save(scene / "rgb" / "000001.png")
    for j in range(3):
        m = np.zeros((480, 640), np.uint8)
        if j < 2:
            m[80:120, 100:160] = 255
        Image.fromarray(m).save(scene / "mask_visib" / f"000001_{j:06d}.png")
    (root / "imageset_test.txt").write_text("000048 000001\n")
    return str(root)


def test_ycbv_reader(bop_root):
    ds = YCBVideoDataset(bop_root, split="imageset_test")
    assert len(ds) == 1
    anno = ds.get_annotation(0)
    # invisible object dropped; xyxy = [x, y, x+w-1, y+h-1]
    assert anno.boxes.shape == (2, 4)
    np.testing.assert_allclose(anno.boxes[0], [100, 80, 159, 119])
    assert [ds.classes[l] for l in anno.labels] == [
        "003_cracker_box", "011_banana",
    ]
    img = ds.load_image(0)
    assert img.shape == (480, 640, 3)
    masks = ds.load_masks(0, anno)
    assert masks.shape == (2, 480, 640)
    assert masks[0, 100, 130] == 1.0


def test_ycbv_ho3d_transfer_filter(bop_root):
    ds = YCBVideoDataset(
        bop_root, split="imageset_test", ycbv_classes_not_in_ho3d=True
    )
    # cracker_box and banana are IN ho3d -> dropped; image has no remaining
    # objects -> filtered out entirely
    assert len(ds) == 0
