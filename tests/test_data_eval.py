"""Data layer + VOC evaluation tests."""

import numpy as np
import pytest

from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.data.evaluation.voc_eval import (
    detection_prec_rec,
    evaluate,
    mask_iou,
    paste_mask,
    voc_ap,
)
from online_detection_tpu.data.transforms import (
    canvas_size,
    preprocess_image,
    resize_scale,
)
from tests.fixtures import make_synthetic_icwt


def test_resize_and_canvas():
    # 640x480 -> min side 600 => 800x600, canvas /32 => 608x800
    assert abs(resize_scale(640, 480) - 1.25) < 1e-6
    assert canvas_size(640, 480) == (608, 800)
    # very wide: max size kicks in (reference rounding may overshoot by a few px)
    s = resize_scale(4000, 500)
    assert 4000 * s <= 1333 + 4


def test_scaled_size_matches_reference_get_size():
    """Output sizes == maskrcnn-benchmark Resize.get_size (the arithmetic the
    reference's baseline dataloader uses; torchvision T.Resize, used by the
    engines' build_transform, is this formula with max_size=None). Note the
    TRUNCATION of the long side — round() differs at e.g. 613x480."""
    from online_detection_tpu.data.transforms import scaled_size

    def ref_get_size(w, h, size, max_size):  # transcribed formula
        if max_size is not None:
            mn, mx = float(min(w, h)), float(max(w, h))
            if mx / mn * size > max_size:
                size = int(round(max_size * mn / mx))
        if (w <= h and w == size) or (h <= w and h == size):
            return w, h
        if w < h:
            return size, int(size * h / w)
        return int(size * w / h), size

    for w in range(480, 2000, 31):
        for h in (480, 607, 641, 1080):
            assert scaled_size(w, h, 600, 1333) == ref_get_size(w, h, 600, 1333)


def test_preprocess_image(rng):
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    canvas, s, (sw, sh) = preprocess_image(img, (608, 800))
    assert canvas.shape == (608, 800, 3)
    assert (sw, sh) == (800, 600)
    # padding region zeros
    assert (canvas[600:, :, :] == 0).all()
    # BGR order: channel 0 relates to input channel 2
    assert canvas.dtype == np.float32


def test_synthetic_dataset_reader(tmp_path):
    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=3, n_test=2)
    ds = ICubWorldDataset(root, "Main", "train")
    assert len(ds) == 3
    anno = ds.get_annotation(0)
    assert anno.boxes.shape[1] == 4 and anno.labels[0] >= 1
    img = ds.load_image(0)
    assert img.shape == (240, 320, 3)
    masks = ds.load_masks(0, anno)
    assert masks.shape == (1, 240, 320)
    # mask covers the annotated box interior
    x1, y1, x2, y2 = anno.boxes[0].astype(int)
    assert masks[0, (y1 + y2) // 2, (x1 + x2) // 2] == 1.0


def _simple_case():
    gts = [
        {
            "boxes": np.array([[10, 10, 50, 50], [100, 100, 160, 160]], float),
            "labels": np.array([1, 2]),
            "difficult": np.array([False, False]),
        }
    ]
    preds = [
        {
            "boxes": np.array(
                [[12, 12, 52, 52], [100, 100, 160, 160], [200, 200, 220, 220]], float
            ),
            "scores": np.array([0.9, 0.8, 0.7]),
            "labels": np.array([1, 2, 1]),
        }
    ]
    return preds, gts


def test_detection_eval_simple():
    preds, gts = _simple_case()
    prec, rec = detection_prec_rec(preds, gts, 0.5)
    # class 1: first pred TP, second (far) FP -> prec [1, .5], rec [1, 1]
    np.testing.assert_allclose(prec[1], [1.0, 0.5])
    np.testing.assert_allclose(rec[1], [1.0, 1.0])
    np.testing.assert_allclose(prec[2], [1.0])
    ap = voc_ap(prec, rec, use_07_metric=True)
    assert np.isnan(ap[0])
    assert abs(ap[1] - 1.0) < 1e-6 and abs(ap[2] - 1.0) < 1e-6


def test_detection_eval_duplicate_and_difficult():
    gts = [
        {
            "boxes": np.array([[10, 10, 50, 50], [300, 300, 340, 340]], float),
            "labels": np.array([1, 1]),
            "difficult": np.array([False, True]),
        }
    ]
    preds = [
        {
            "boxes": np.array(
                [[10, 10, 50, 50], [11, 11, 51, 51], [300, 300, 340, 340]], float
            ),
            "scores": np.array([0.9, 0.85, 0.8]),
            "labels": np.array([1, 1, 1]),
        }
    ]
    prec, rec = detection_prec_rec(preds, gts, 0.5)
    # dup of matched gt -> FP; difficult match ignored entirely
    np.testing.assert_allclose(prec[1], [1.0, 0.5, 0.5])
    np.testing.assert_allclose(rec[1], [1.0, 1.0, 1.0])  # n_pos counts only non-difficult


def test_mask_iou_and_paste():
    a = np.zeros((1, 20, 20), bool)
    a[0, 5:10, 5:10] = True
    b = np.zeros((2, 20, 20), bool)
    b[0, 5:10, 5:10] = True
    b[1, 0:5, 0:5] = True
    iou = mask_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 0.0]])

    m = np.ones((14, 14), np.float32)
    pasted = paste_mask(m, np.array([10, 10, 29, 29], float), 40, 40)
    # pasted roughly covers the box
    assert pasted[15:25, 15:25].all()
    assert pasted[:8].sum() == 0


def test_full_evaluate_result_txt(tmp_path):
    preds, gts = _simple_case()
    gts[0]["masks"] = np.zeros((2, 200, 260), np.uint8)
    gts[0]["masks"][0, 10:51, 10:51] = 1
    gts[0]["masks"][1, 100:161, 100:161] = 1
    preds[0]["masks"] = np.ones((3, 14, 14), np.float32)
    res = evaluate(
        preds, gts, ["bg", "a", "b"], iou_thresholds=(0.5, 0.7),
        evaluate_segmentation=True, output_dir=str(tmp_path),
    )
    assert res["det_map_0.5"] > 0.9
    txt = (tmp_path / "result.txt").read_text()
    assert "Detection mAP50" in txt and "Segmentation mAP70" in txt
    assert "a" in txt
