"""Differential parity: the VOC evaluator vs the LITERAL reference evaluator
(``icw_eval.py`` — the chainercv-derived code both dataset families share).

The reference file imports cleanly with three thin stubs (see
``ref_shims.install_maskrcnn_eval_stubs``); its matching/AP logic and the
REAL reference Masker then run unmodified against this framework's
``data/evaluation/voc_eval.py`` on identical synthetic predictions."""

import numpy as np
import pytest
import torch

from tests.ref_shims import (
    install_maskrcnn_eval_stubs,
    load_reference_module,
)


@pytest.fixture(scope="module")
def ref_eval():
    install_maskrcnn_eval_stubs()
    return load_reference_module(
        "src/modules/feature-extractor/mrcnn_modified/data/datasets/"
        "evaluation/icubworld/icw_eval.py",
        "ref_icw_eval",
        ("src",),
    )


def _boxlist(boxes, size_wh, **fields):
    import sys

    BoxList = sys.modules["maskrcnn_benchmark.structures.bounding_box"].BoxList
    b = BoxList(torch.from_numpy(np.asarray(boxes, np.float32)), size_wh)
    for k, v in fields.items():
        b.add_field(k, v)
    return b


def _rand_boxes(rng, n, w, h):
    x1 = rng.uniform(0, w - 40, n)
    y1 = rng.uniform(0, h - 40, n)
    bw = rng.uniform(10, 38, n)
    bh = rng.uniform(10, 38, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], axis=1).astype(np.float32)


@pytest.mark.parametrize("use_07", [True, False])
def test_detection_eval_matches_reference(ref_eval, use_07):
    rng = np.random.default_rng(3)
    w, h = 320, 240
    gt_bls, pred_bls, gts, preds = [], [], [], []
    for _ in range(4):
        n_gt = int(rng.integers(1, 4))
        gb = _rand_boxes(rng, n_gt, w, h)
        gl = rng.integers(1, 3, n_gt).astype(np.int64)
        gd = rng.random(n_gt) < 0.25
        n_p = int(rng.integers(2, 8))
        # half the predictions hug a GT box, half are noise
        pb = _rand_boxes(rng, n_p, w, h)
        for i in range(0, n_p, 2):
            pb[i] = gb[i % n_gt] + rng.normal(0, 3, 4)
        pl = rng.integers(1, 3, n_p).astype(np.int64)
        ps = rng.random(n_p).astype(np.float32)
        gt_bls.append(_boxlist(
            gb, (w, h),
            labels=torch.from_numpy(gl),
            difficult=torch.from_numpy(gd),
        ))
        pred_bls.append(_boxlist(
            pb, (w, h),
            labels=torch.from_numpy(pl),
            scores=torch.from_numpy(ps),
        ))
        gts.append({"boxes": gb, "labels": gl, "difficult": gd})
        preds.append({"boxes": pb, "labels": pl, "scores": ps})

    ref = ref_eval.eval_detection_icw(
        pred_bls, gt_bls, iou_thresh=0.5, use_07_metric=use_07
    )

    from online_detection_tpu.data.evaluation.voc_eval import (
        detection_prec_rec,
        voc_ap,
    )

    prec, rec = detection_prec_rec(preds, gts, 0.5)
    ap = voc_ap(prec, rec, use_07_metric=use_07)
    np.testing.assert_allclose(ap, ref["ap"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        float(np.nanmean(ap)), ref["map"], rtol=1e-6
    )


def test_masker_paste_matches_reference(ref_eval):
    """The REAL reference Masker vs paste_mask on the same 14x14 logits."""
    import sys

    inference = sys.modules[
        "mrcnn_modified.modeling.roi_heads.mask_head.inference"
    ]
    rng = np.random.default_rng(7)
    im_h, im_w = 120, 160

    from online_detection_tpu.data.evaluation.voc_eval import paste_mask

    total = agree = 0
    for _ in range(6):
        m = rng.random((14, 14)).astype(np.float32)
        m[3:11, 4:12] += 0.5  # a blob
        box = np.array([
            rng.uniform(0, im_w - 50), rng.uniform(0, im_h - 50),
        ], np.float32)
        box = np.concatenate([box, box + rng.uniform(15, 45, 2)]).astype(np.float32)
        ref_mask = inference.paste_mask_in_image(
            torch.from_numpy(m), torch.from_numpy(box), im_h, im_w,
            thresh=0.5, padding=1,
        ).numpy()
        mine = paste_mask(m, box, im_h, im_w, thresh=0.5, padding=1) > 0
        total += ref_mask.size
        agree += int((ref_mask == mine).sum())
    # bilinear resize boundaries may disagree on isolated pixels between the
    # torch and numpy implementations; demand >99.7% pixel agreement
    assert agree / total > 0.997, agree / total


def test_segmentation_eval_matches_reference(ref_eval):
    rng = np.random.default_rng(11)
    w, h = 160, 120

    class SegMasksStub:
        def __init__(self, t):
            self._t = t

        def get_mask_tensor(self):
            return self._t

    gt_bls, pred_bls, gts, preds = [], [], [], []
    for _ in range(3):
        n_gt = int(rng.integers(1, 3))
        gb = _rand_boxes(rng, n_gt, w, h)
        gl = rng.integers(1, 3, n_gt).astype(np.int64)
        gmask = np.zeros((n_gt, h, w), np.uint8)
        for i, b in enumerate(gb):
            gmask[i, int(b[1]):int(b[3]), int(b[0]):int(b[2])] = 1
        n_p = int(rng.integers(1, 5))
        pb = gb[rng.integers(0, n_gt, n_p)] + rng.normal(0, 2, (n_p, 4)).astype(np.float32)
        pl = rng.integers(1, 3, n_p).astype(np.int64)
        ps = rng.random(n_p).astype(np.float32)
        pmask = np.zeros((n_p, 14, 14), np.float32)
        pmask[:, 1:13, 1:13] = 0.9  # solid predicted blob
        gt_bls.append(_boxlist(
            gb, (w, h),
            labels=torch.from_numpy(gl),
            difficult=torch.zeros(n_gt, dtype=torch.bool),
            masks=SegMasksStub(torch.from_numpy(gmask)),
        ))
        pred_bls.append(_boxlist(
            pb, (w, h),
            labels=torch.from_numpy(pl),
            scores=torch.from_numpy(ps),
            mask=torch.from_numpy(pmask[:, None]),
        ))
        gts.append({
            "boxes": gb, "labels": gl,
            "difficult": np.zeros(n_gt, bool), "masks": gmask.astype(bool),
        })
        preds.append({
            "boxes": pb, "labels": pl, "scores": ps, "masks": pmask,
        })

    ref = ref_eval.eval_segmentation_ycbv(
        pred_bls, gt_bls, iou_thresh=0.5, use_07_metric=True
    )

    from online_detection_tpu.data.evaluation.voc_eval import (
        segmentation_prec_rec,
        voc_ap,
    )

    prec, rec = segmentation_prec_rec(preds, gts, 0.5)
    ap = voc_ap(prec, rec, use_07_metric=True)
    np.testing.assert_allclose(ap, ref["ap"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(np.nanmean(ap)), ref["map"], rtol=1e-6)