"""Differential parity of the POSTPROCESSORS against the literal reference.

- ``modeling/rpn/inference.py`` RPNPostProcessor (sigmoid -> pre-NMS top-k ->
  BoxCoder decode -> clip -> remove-small -> NMS 0.7 -> post-NMS top-n, with
  the REAL permute_and_flatten channel layout) vs ``models/rpn.propose``;
- ``accuracy-evaluator/OnlineDetectionPostProcessor.py`` (REAL PostProcessor
  parent + REAL ``py_od_utils.decode_boxes_detector`` decode, one-sided
  clamp, strict ``> score_thresh``, per-class NMS 0.3, global kthvalue
  top-k) vs ``models/postprocess.postprocess_detections``.

The maskrcnn primitives the reference files call (greedy NMS, BoxCoder
decode, clip/remove-small) are transcribed in tests/ref_shims.py with cited
Detectron conventions; their semantics are locked on our side by
tests/test_nms.py and tests/test_boxes.py. Everything else — orderings,
threshold strictness, channel layouts, per-class loops, caps — is the
reference's literal code vs our fixed-shape implementations.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from online_detection_tpu.models.postprocess import postprocess_detections
from online_detection_tpu.models.rpn import propose
from tests.ref_shims import (
    legacy_torch,
    load_online_det_postprocessor_module,
    load_rpn_postprocessor_module,
)

pytestmark = pytest.mark.fast


def _boxlist(bbox, size):
    import sys

    BoxList = sys.modules["maskrcnn_benchmark.structures.bounding_box"].BoxList
    return BoxList(torch.as_tensor(np.asarray(bbox), dtype=torch.float32), size)


def _sorted_by_score(boxes, scores, labels=None):
    order = np.argsort(-scores, kind="stable")
    if labels is None:
        return boxes[order], scores[order]
    return boxes[order], scores[order], labels[order]


# --------------------------------------------------------------------------
# RPN proposal postprocessor


@pytest.mark.parametrize("min_size", [0, 6])
def test_rpn_postprocessor_matches_reference(min_size):
    mod = load_rpn_postprocessor_module()
    rng = np.random.default_rng(0)
    a_cls, h, w = 4, 5, 6
    img_w, img_h = 48, 40
    n = a_cls * h * w

    # anchors in the reference's (H, W, A) flat order — the same order our
    # grid_anchors/propose contract uses (hw-major, anchor-minor)
    cx = rng.uniform(4, img_w - 4, n)
    cy = rng.uniform(4, img_h - 4, n)
    aw = rng.uniform(4, 24, n)
    ah = rng.uniform(4, 24, n)
    anchors = np.stack(
        [cx - aw / 2, cy - ah / 2, cx + aw / 2, cy + ah / 2], axis=1
    ).astype(np.float32)
    scores_flat = rng.standard_normal((n,)).astype(np.float32)
    deltas_flat = (rng.standard_normal((n, 4)) * 0.2).astype(np.float32)

    # reference tensors: objectness [1, A, H, W] with
    # objectness[0, a, y, x] = scores_flat[(y*W + x)*A + a] (the
    # permute_and_flatten inverse), box_regression [1, A*4, H, W]
    obj = (
        torch.tensor(scores_flat)
        .reshape(h, w, a_cls)
        .permute(2, 0, 1)[None]
    )
    reg = (
        torch.tensor(deltas_flat)
        .reshape(h, w, a_cls, 4)
        .permute(2, 3, 0, 1)
        .reshape(1, a_cls * 4, h, w)
    )

    import sys

    BoxCoder = sys.modules["maskrcnn_benchmark.modeling.box_coder"].BoxCoder
    with legacy_torch():
        post = mod.RPNPostProcessor(
            pre_nms_top_n=50,
            post_nms_top_n=20,
            nms_thresh=0.7,
            min_size=min_size,
            box_coder=BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)),
        )
        post.eval()
        anchors_bl = _boxlist(anchors, (img_w, img_h))
        [result] = post.forward([[anchors_bl]], [obj], [reg])
    ref_boxes = result.bbox.numpy()
    ref_scores = result.get_field("objectness").numpy()

    got_boxes, got_scores, got_valid = propose(
        jnp.asarray(scores_flat),
        jnp.asarray(deltas_flat),
        jnp.asarray(anchors),
        (img_w, img_h),
        pre_nms_top_n=50,
        post_nms_top_n=20,
        nms_thresh=0.7,
        min_size=min_size,
    )
    got_boxes = np.asarray(got_boxes)[np.asarray(got_valid)]
    got_scores = np.asarray(got_scores)[np.asarray(got_valid)]

    assert len(got_scores) == len(ref_scores)
    rb, rs = _sorted_by_score(ref_boxes, ref_scores)
    gb, gs = _sorted_by_score(got_boxes, got_scores)
    np.testing.assert_allclose(gs, rs, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gb, rb, atol=1e-3, rtol=1e-4)


# --------------------------------------------------------------------------
# Online detection postprocessor


@pytest.mark.parametrize("detections_per_img", [100, 6])
def test_online_detection_postprocessor_matches_reference(detections_per_img):
    mod = load_online_det_postprocessor_module()
    rng = np.random.default_rng(1)
    n_cls, r = 4, 25  # 3 foreground classes + background
    img_w, img_h = 60, 50

    x1 = rng.uniform(-5, img_w - 8, r)
    y1 = rng.uniform(-5, img_h - 8, r)
    props = np.stack(
        [x1, y1, x1 + rng.uniform(4, 30, r), y1 + rng.uniform(4, 30, r)],
        axis=1,
    ).astype(np.float32)
    scores = rng.uniform(-3.0, 1.0, (r, n_cls)).astype(np.float32)
    scores[:, 0] = -2.0  # background column
    scores[:, 3] = -2.5  # one class entirely below threshold
    deltas = (rng.standard_normal((r, n_cls * 4)) * 0.15).astype(np.float32)

    with legacy_torch():
        post = mod.OnlineDetectionPostProcessor(
            score_thresh=-2.0, nms=0.3, detections_per_img=detections_per_img
        )
        result = post.forward(
            (torch.tensor(scores), torch.tensor(deltas)),
            [_boxlist(props, (img_w, img_h))],
            num_classes=n_cls,
            img_size=(img_w, img_h),
        )
    ref_boxes = result.bbox.numpy()
    ref_scores = result.get_field("scores").numpy()
    ref_labels = result.get_field("labels").numpy()

    det = postprocess_detections(
        jnp.asarray(props),
        jnp.ones((r,), bool),
        jnp.asarray(scores),
        jnp.asarray(deltas),
        (img_w, img_h),
        score_thresh=-2.0,
        nms_thresh=0.3,
        detections_per_img=detections_per_img,
        per_class_cap=r,
    )
    valid = np.asarray(det.valid)
    got_boxes = np.asarray(det.boxes)[valid]
    got_scores = np.asarray(det.scores)[valid]
    got_labels = np.asarray(det.labels)[valid]

    assert len(got_scores) == len(ref_scores)
    assert np.all(got_labels != 3)  # below-threshold class never surfaces
    rb, rs, rl = _sorted_by_score(ref_boxes, ref_scores, ref_labels)
    gb, gs, gl = _sorted_by_score(got_boxes, got_scores, got_labels)
    np.testing.assert_allclose(gs, rs, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(gl, rl)
    np.testing.assert_allclose(gb, rb, atol=1e-3, rtol=1e-4)


# --------------------------------------------------------------------------
# Standalone (cached-test_boxes) detection postprocessor


@pytest.mark.parametrize("detections_per_img", [100, 6])
def test_standalone_postprocessor_matches_reference(detections_per_img):
    """``OnlineDetectionPostProcessor_standalone.py:10-103`` (pre-refined
    per-class boxes, two-sided clip_to_image, strict > thresh, per-class NMS,
    kthvalue global cap keeping ties) vs
    ``postprocess_detections_standalone``."""
    from online_detection_tpu.models.postprocess import (
        postprocess_detections_standalone,
    )
    from tests.ref_shims import load_online_det_postprocessor_standalone_module

    mod = load_online_det_postprocessor_standalone_module()
    rng = np.random.default_rng(11)
    n, c = 40, 3  # proposals, foreground classes (num_classes = c + 1)
    img_w, img_h = 64, 48

    # refined per-class boxes [N, C+1, 4]; some coords beyond the image to
    # exercise the two-sided clamp on both sides
    x1 = rng.uniform(-8, img_w - 6, size=(n, c + 1))
    y1 = rng.uniform(-8, img_h - 6, size=(n, c + 1))
    bw = rng.uniform(4, 30, size=(n, c + 1))
    bh = rng.uniform(4, 30, size=(n, c + 1))
    boxes = np.stack([x1, y1, x1 + bw, y1 + bh], axis=2).astype(np.float32)
    scores = rng.uniform(-3.0, 1.0, size=(n, c + 1)).astype(np.float32)
    scores[:, 0] = -1.0  # background column (testRegionClassifier contract)

    with legacy_torch():
        post = mod.OnlineDetectionPostProcessor(
            score_thresh=-2.0, nms=0.3,
            detections_per_img=detections_per_img,
            cls_agnostic_bbox_reg=False,
        )
        bl = _boxlist(boxes.reshape(n, -1), (img_w, img_h))
        bl.add_field("scores", torch.tensor(scores))
        [res] = post([bl], c + 1)
    ref = np.concatenate(
        [
            res.bbox.numpy(),
            res.get_field("scores").numpy()[:, None],
            res.get_field("labels").numpy().astype(np.float32)[:, None],
        ],
        axis=1,
    )

    dets = postprocess_detections_standalone(
        jnp.asarray(boxes.reshape(n, -1)),
        jnp.asarray(scores),
        jnp.ones((n,), bool),
        (img_w, img_h),
        score_thresh=-2.0,
        nms_thresh=0.3,
        detections_per_img=detections_per_img,
    )
    keep = np.asarray(dets.valid)
    got = np.concatenate(
        [
            np.asarray(dets.boxes)[keep],
            np.asarray(dets.scores)[keep][:, None],
            np.asarray(dets.labels)[keep].astype(np.float32)[:, None],
        ],
        axis=1,
    )
    assert got.shape == ref.shape
    order_g = np.lexsort(got.T)
    order_r = np.lexsort(ref.T)
    np.testing.assert_allclose(
        got[order_g], ref[order_r], rtol=1e-5, atol=1e-5
    )
