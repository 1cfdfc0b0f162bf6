"""Differential parity of the data layer vs the LITERAL reference code.

The reference builds GT boxes through TWO disagreeing parsers:

- dataset classes (``data/datasets/icubworld.py:211-218``,
  ``ycb_video.py:190+``) feed the *evaluator* — XML boxes unshifted
  (TO_REMOVE=0, the always-truthy ``'HO3D' or 'ycbv' in self.root``),
  difficult objects filtered;
- the engines re-parse annotations for the boxes fed to the *model*
  (``feature_proposal_extractor.py:115-231``, ``engine/inference.py:
  143-263``) — XML boxes get an unconditional -1 (the inverted always-truthy
  condition at ``feature_proposal_extractor.py:168``) and difficult is never
  read.

These tests run the literal reference parsers (via tests/ref_shims.py) on
synthetic iCWT-XML and YCBV-BOP trees and assert our ``get_annotation``
(eval side) and ``harvest_annotation`` (model side) reproduce each
convention exactly, including where they differ from each other.
"""

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest
import torch

from online_detection_tpu.data.datasets import harvest_annotation
from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.data.datasets.ycb_video import YCBVideoDataset

from . import ref_shims

pytestmark = pytest.mark.fast


# ---------------------------------------------------------------- fixtures


def _write_xml(path, w, h, objects):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "width").text = str(w)
    for name, box, difficult in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        ET.SubElement(obj, "difficult").text = str(int(difficult))
        bb = ET.SubElement(obj, "bndbox")
        for k, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, k).text = str(int(v))
    ET.ElementTree(root).write(path)


@pytest.fixture
def icwt_tree(tmp_path):
    """iCWT-layout tree whose root contains 'ycbv' (the in-hand XML family),
    with one multi-object image including a difficult box."""
    from PIL import Image

    root = tmp_path / "ycbv_in_hand"
    for d in ("Annotations", "Images", "Masks"):
        (root / d).mkdir(parents=True)
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.default_rng(3)
    ids = ["im_000", "im_001"]
    objs = {
        "im_000": [("011_banana", (37, 22, 140, 95), False),
                   ("025_mug", (160, 60, 230, 150), True)],
        "im_001": [("003_cracker_box", (10, 10, 80, 77), False)],
    }
    for img_id in ids:
        Image.fromarray(
            rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        ).save(root / "Images" / f"{img_id}.jpg")
        m = np.zeros((240, 320), np.uint8)
        m[22:95, 37:140] = 255
        Image.fromarray(m).save(root / "Masks" / f"{img_id}.png")
        _write_xml(root / "Annotations" / f"{img_id}.xml", 320, 240,
                   objs[img_id])
    (root / "ImageSets" / "Main" / "train.txt").write_text(
        "\n".join(ids) + "\n"
    )
    return str(root), ids


@pytest.fixture
def bop_tree(tmp_path):
    from PIL import Image

    root = tmp_path / "YCB-Video" / "test"
    scene = root / "000048"
    (scene / "rgb").mkdir(parents=True)
    (scene / "mask_visib").mkdir()
    rng = np.random.default_rng(5)
    scene_gt = {"1": [{"obj_id": 2}, {"obj_id": 10}, {"obj_id": 5},
                      {"obj_id": 14}, {"obj_id": 1}]}
    scene_gt_info = {"1": [
        {"bbox_visib": [100, 80, 60, 40]},
        {"bbox_visib": [300, 200, 50, 70]},
        {"bbox_visib": [-1, -1, -1, -1]},   # invisible -> skipped
        {"bbox_visib": [20, 30, 0, 15]},    # zero width -> skipped
        {"bbox_visib": [400, 100, 45, 55]},  # 002_... (not in HO3D)
    ]}
    (scene / "scene_gt.json").write_text(json.dumps(scene_gt))
    (scene / "scene_gt_info.json").write_text(json.dumps(scene_gt_info))
    Image.fromarray(
        rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    ).save(scene / "rgb" / "000001.png")
    for j in range(5):
        m = np.zeros((480, 640), np.uint8)
        m[80 + j : 120, 100:160] = 255
        Image.fromarray(m).save(scene / "mask_visib" / f"000001_{j:06d}.png")
    (root / "imageset_test.txt").write_text("000048 000001\n")
    return str(root)


# ------------------------------------------------------- iCWT (XML family)


def test_icwt_eval_groundtruth_matches_reference(icwt_tree):
    root, ids = icwt_tree
    ref_mod = ref_shims.load_reference_icubworld_module()
    with ref_shims.legacy_torch():
        ref_ds = ref_mod.iCubWorldDataset(
            root, "Main", "train", use_difficult=False,
            remove_images_without_annotations=False,
        )
        ours = ICubWorldDataset(root, "Main", "train", use_difficult=False,
                                remove_images_without_annotations=False)
        assert ref_ds.ids == ours.ids
        assert ref_ds.class_to_ind == ours.class_to_ind
        for i in range(len(ids)):
            target = ref_ds.get_groundtruth(i)
            anno = ours.get_annotation(i)
            np.testing.assert_array_equal(
                target.bbox.numpy(), anno.boxes
            )
            np.testing.assert_array_equal(
                target.get_field("labels").numpy(), anno.labels
            )
            np.testing.assert_array_equal(
                target.get_field("difficult").numpy().astype(bool),
                anno.difficult,
            )
            # im_info is (height, width)
            assert tuple(target.size) == (anno.width, anno.height)


def test_icwt_harvest_gts_match_reference_engine(icwt_tree):
    root, ids = icwt_tree
    fpe = ref_shims.load_feature_proposal_extractor_module()
    ours = ICubWorldDataset(root, "Main", "train",
                            remove_images_without_annotations=False)
    with ref_shims.legacy_torch():
        for i in range(len(ids)):
            # our dataset object carries the same _imgpath/_annopath/
            # _maskpath/ids attrs the reference engine reads
            image, gt_boxes, masks, gt_labels, img_sizes, _ = (
                fpe.compute_gts_icwt(ours, i)
            )
            hanno = harvest_annotation(ours, i)
            np.testing.assert_array_equal(
                np.asarray(gt_boxes, np.float32), hanno.boxes
            )
            np.testing.assert_array_equal(
                np.asarray(gt_labels, np.int32), hanno.labels
            )
            assert img_sizes == [hanno.width, hanno.height]
            # one full-image mask per object (reference quirk)
            assert len(masks) == len(gt_boxes)

    # the documented split: harvest boxes = eval boxes - 1, and the
    # difficult object is present at harvest but filtered from eval
    eval_anno = ours.get_annotation(0)
    harv_anno = harvest_annotation(ours, 0)
    assert len(harv_anno.boxes) == 2 and len(eval_anno.boxes) == 1
    np.testing.assert_array_equal(harv_anno.boxes[0], eval_anno.boxes[0] - 1)


# -------------------------------------------------------- YCBV (BOP family)


def test_ycbv_eval_groundtruth_matches_reference(bop_tree):
    ref_mod = ref_shims.load_reference_ycbv_module()
    with ref_shims.legacy_torch():
        ref_ds = ref_mod.YCBVideoDataset(
            bop_tree, "", "imageset_test",
            remove_images_without_annotations=False,
        )
        ours = YCBVideoDataset(bop_tree, split="imageset_test")
        assert ref_ds.ids == ours.ids
        target = ref_ds.get_groundtruth(0)
        anno = ours.get_annotation(0)
        np.testing.assert_array_equal(
            np.asarray(target.bbox), anno.boxes
        )
        np.testing.assert_array_equal(
            np.asarray(target.get_field("labels")), anno.labels
        )


def test_ycbv_harvest_gts_match_reference_engine(bop_tree):
    fpe = ref_shims.load_feature_proposal_extractor_module()
    ref_mod = ref_shims.load_reference_ycbv_module()
    with ref_shims.legacy_torch():
        ref_ds = ref_mod.YCBVideoDataset(
            bop_tree, "", "imageset_test",
            remove_images_without_annotations=False,
        )
        image, gt_boxes, masks, gt_labels, img_sizes, _ = fpe.compute_gts_ycbv(
            ref_ds, 0, extract_features_segmentation=True
        )
    ours = YCBVideoDataset(bop_tree, split="imageset_test")
    hanno = harvest_annotation(ours, 0)
    np.testing.assert_array_equal(np.asarray(gt_boxes, np.float32),
                                  hanno.boxes)
    np.testing.assert_array_equal(np.asarray(gt_labels, np.int32),
                                  hanno.labels)
    assert img_sizes == [hanno.width, hanno.height]
    # harvest == eval on the BOP path (the one agreeing pair)
    np.testing.assert_array_equal(hanno.boxes, ours.get_annotation(0).boxes)
    # mask set: same count, same binarized content
    our_masks = ours.load_masks(0, hanno)
    assert len(masks) == our_masks.shape[0]
    for j, m in enumerate(masks):
        np.testing.assert_array_equal(
            (m.numpy()[0] > 0).astype(np.float32), our_masks[j]
        )


def test_ycbv_ho3d_transfer_filter_matches_reference(bop_tree):
    ref_mod = ref_shims.load_reference_ycbv_module()
    with ref_shims.legacy_torch():
        ref_ds = ref_mod.YCBVideoDataset(
            bop_tree, "", "imageset_test",
            remove_images_without_annotations=False,
            ycbv_classes_not_in_ho3d=True,
        )
        target = ref_ds.get_groundtruth(0)
    ours = YCBVideoDataset(bop_tree, split="imageset_test",
                           ycbv_classes_not_in_ho3d=True)
    anno = ours.get_annotation(0)
    np.testing.assert_array_equal(np.asarray(target.bbox), anno.boxes)
    np.testing.assert_array_equal(
        np.asarray(target.get_field("labels")), anno.labels
    )
