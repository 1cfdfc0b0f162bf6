"""Demo module, incremental teacher, HO3D converter, visualizer smoke."""

import os

import numpy as np
import jax
import pytest

from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.data.ho3d_to_icwt import (
    convert,
    write_imagesets,
    write_reference_imagesets,
)
from online_detection_tpu.models.detector import DetectorConfig, init_detector_params
from online_detection_tpu.modules.demo import IncrementalTeacher, OnlineSegmentationDemo
from online_detection_tpu.pipelines.online_pipeline import OnlineTrainConfig
from tests.test_detector import build_online


def test_demo_run_and_overlay(rng):
    params = init_detector_params(jax.random.key(0), 15, 4)
    online = build_online(rng)
    demo = OnlineSegmentationDemo(
        params, online, ["bg", "a", "b", "c"], canvas_hw=(128, 192),
        det_cfg=DetectorConfig(pre_nms_top_n=100, post_nms_top_n=30, detections_per_img=5),
        min_size=128, max_size=320,
    )
    rgb = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    result = demo.run_on_image(rgb)
    assert set(result) >= {"boxes", "scores", "labels", "class_names", "masks"}
    if len(result["masks"]):
        assert result["masks"].shape[1:] == (240, 320)
    overlay = demo.overlay(rgb, result)
    assert overlay.shape == rgb.shape and overlay.dtype == np.uint8


def test_incremental_teacher(rng):
    params = init_detector_params(jax.random.key(0), 15, 4)
    teacher = IncrementalTeacher(
        params, canvas_hw=(128, 192),
        train_cfg=OnlineTrainConfig(
            num_classes=0, det_m=16, rpn_m=16, segm_m=8,
            iterations=2, batch_size=32, segm_batch_size=128,
        ),
        det_cfg=DetectorConfig(pre_nms_top_n=100, post_nms_top_n=30),
        min_size=128, max_size=320,
    )
    cup = teacher.add_new_class("cup")
    assert cup == 1
    rgb = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    mask = np.zeros((240, 320), np.float32)
    mask[50:120, 60:140] = 1
    teacher.observe(rgb, [60, 50, 140, 120], cup, mask)
    teacher.observe(rgb, [60, 50, 140, 120], cup, mask)
    online1 = teacher.update_model()
    assert bool(online1.detector.falkon.exists[0])
    # teach a second class incrementally
    ball = teacher.add_new_class("ball")
    rgb2 = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    teacher.observe(rgb2, [10, 10, 80, 90], ball, mask)
    online2 = teacher.update_model()
    assert online2.detector.falkon.alpha.shape[0] == 2
    assert bool(online2.detector.falkon.exists.all())


def test_ho3d_converter(tmp_path, rng):
    from PIL import Image

    # fabricate one HO3D sequence
    src = tmp_path / "HO3D" / "train" / "MC1"
    (src / "rgb").mkdir(parents=True)
    (src / "seg").mkdir(parents=True)
    seg = np.zeros((120, 160, 3), np.uint8)
    seg[30:60, 40:90, 2] = 255  # blue channel marks the object
    Image.fromarray(seg).save(src / "seg" / "0000.png")
    Image.fromarray(
        rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    ).save(src / "rgb" / "0000.png")

    out = str(tmp_path / "HO3D_V2_iCWT_format")
    ids = convert(str(tmp_path / "HO3D" / "train"), out)
    assert ids == ["MC1/0000"]
    write_imagesets(out, ids)
    ds = ICubWorldDataset(
        os.path.join(out, "train").replace(str(tmp_path), str(tmp_path)) ,
        "", "imageset_train",
    )
    # dir name contains HO3D -> HO3D class table; 003_cracker_box = label 1
    anno = ds.get_annotation(0)
    assert ds.classes[anno.labels[0]] == "003_cracker_box"
    # box matches scaled mask extents (seg upscaled 4x to 640x480)
    assert anno.boxes[0][0] >= 150 and anno.boxes[0][2] <= 370
    masks = ds.load_masks(0, anno)
    assert masks.shape == (1, 480, 640) and masks.max() == 1.0


def test_ho3d_reference_imagesets(tmp_path):
    """The curated held-out-sequence splits match the reference's shipped
    ImageSets layout: sequence membership (test sequences never in train),
    case-insensitive sequence order, and a GLOBAL stride over the
    concatenated frames — the phase carries across sequence boundaries
    (reference files: Data/datasets/HO3D_V2_iCWT_format/train/ImageSets/
    *.txt, e.g. imageset_test_1_out_of_5 runs BB14/1190 -> GPMF14/0001)."""
    from PIL import Image

    seqs = {"MC1": 8, "MC5": 11, "MC6": 7, "ShSu14": 6, "SM4": 6}
    for seq, n in seqs.items():
        src = tmp_path / "HO3D" / "train" / seq
        (src / "rgb").mkdir(parents=True)
        (src / "seg").mkdir(parents=True)
        seg = np.zeros((480, 640, 3), np.uint8)
        seg[30:60, 40:90, 2] = 255
        for i in range(n):
            Image.fromarray(seg).save(src / "seg" / f"{i:04d}.png")

    out = str(tmp_path / "out")
    ids = convert(str(tmp_path / "HO3D" / "train"), out)
    paths = dict(
        (os.path.basename(p), (p, n))
        for p, n in write_reference_imagesets(out, ids)
    )
    read = lambda name: [
        l for l in open(paths[name][0]).read().splitlines() if l
    ]

    train = read("imageset_train_1_out_of_2.txt")
    # train: MC1 + MC5 (+ ShSu14, SM4...) at a GLOBAL stride of 2; NEVER MC6
    assert [l for l in train if l.startswith("MC1/")] == [
        f"MC1/{i:04d}" for i in range(0, 8, 2)
    ]
    # MC1 has 8 frames, so the stride phase entering MC5 is 0 (8 % 2)
    assert [l for l in train if l.startswith("MC5/")] == [
        f"MC5/{i:04d}" for i in range(0, 11, 2)
    ]
    # MC5 has 11 frames -> cumulative 19 -> ShSu14 enters at phase 1
    assert [l for l in train if l.startswith("ShSu14/")] == [
        "ShSu14/0001", "ShSu14/0003", "ShSu14/0005"
    ]
    assert not any(l.startswith("MC6/") for l in train)
    test = read("imageset_test_1_out_of_5.txt")
    assert test == [f"MC6/{i:04d}" for i in range(0, 7, 5)]
    val = read("imageset_val_1_out_of_5.txt")
    # case-insensitive sequence order MC5 < ShSu14 < SM4, global stride 5:
    # MC5 0,5,10; concat idx 15 = ShSu14 local 4; idx 20 = SM4 local 3
    assert val == (
        [f"MC5/{i:04d}" for i in range(0, 11, 5)]
        + ["ShSu14/0004", "SM4/0003"]
    )
    # the 3-seq training variant keeps MC1 but drops the 4th sequence MC5
    train3 = read("imageset_train_1_out_of_2_3_seq.txt")
    assert any(l.startswith("MC1/") for l in train3)
    assert not any(l.startswith("MC5/") for l in train3)


def test_ho3d_bilinear_resize_matches_cv2_convention():
    """_resize_bilinear_cv2 reproduces cv2 INTER_LINEAR's center-aligned
    sampling (identity at same size; exact half-pixel averages on 2x
    downscale) — the reference thresholds AFTER this resize
    (ho3d-to-icwt-format.py:197-198)."""
    from online_detection_tpu.data.ho3d_to_icwt import _resize_bilinear_cv2

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    assert _resize_bilinear_cv2(img, (4, 4)) is img  # identity, bit-exact
    # 2x downscale: dst(0,0) samples src at (0.5, 0.5) = mean of the 2x2 block
    small = _resize_bilinear_cv2(img, (2, 2))
    expect = img.reshape(2, 2, 2, 2, 3).astype(np.float32).mean(axis=(1, 3))
    np.testing.assert_array_equal(small, np.rint(expect).astype(np.uint8))
    # 2x upscale of a binary step keeps the step within one pixel
    step = np.zeros((4, 4, 3), np.uint8)
    step[:, 2:] = 200
    big = _resize_bilinear_cv2(step, (8, 8))
    assert big[0, 3, 2] < 100 <= big[0, 5, 2]
