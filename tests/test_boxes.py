"""Box geometry unit tests against brute-force NumPy references implementing
the reference repo's formulas (+1 pixel convention)."""

import numpy as np
import jax.numpy as jnp

from online_detection_tpu.utils import boxes as B


def np_iou(a, b):
    """Brute-force IoU with +1 convention (maskrcnn-benchmark boxlist_iou)."""
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            iw, ih = max(ix2 - ix1 + 1, 0), max(iy2 - iy1 + 1, 0)
            inter = iw * ih
            area_i = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
            area_j = (bj[2] - bj[0] + 1) * (bj[3] - bj[1] + 1)
            out[i, j] = inter / (area_i + area_j - inter)
    return out


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def test_iou_matches_bruteforce(rng):
    a = random_boxes(rng, 17)
    b = random_boxes(rng, 9)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5)


def test_iou_identity(rng):
    a = random_boxes(rng, 5)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(got), 1.0, rtol=1e-6)


def test_encode_decode_roundtrip(rng):
    proposals = random_boxes(rng, 31)
    gts = random_boxes(rng, 31)
    deltas = B.encode_boxes(jnp.asarray(gts), jnp.asarray(proposals))
    rec = B.decode_boxes(deltas, jnp.asarray(proposals), clip_exp=False)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-3)


def test_decode_matches_reference_formula(rng):
    """Mirror py_od_utils.decode_boxes_detector:247-274 exactly (no clamping,
    then clip to image)."""
    boxes = random_boxes(rng, 8)
    n_cls = 3
    deltas = rng.normal(0, 0.2, (8, 4 * n_cls))

    src_w = boxes[:, 2] - boxes[:, 0] + 1
    src_h = boxes[:, 3] - boxes[:, 1] + 1
    src_cx = boxes[:, 0] + 0.5 * src_w
    src_cy = boxes[:, 1] + 0.5 * src_h
    want = np.zeros_like(deltas)
    pred_cx = deltas[:, 0::4] * src_w[:, None] + src_cx[:, None]
    pred_cy = deltas[:, 1::4] * src_h[:, None] + src_cy[:, None]
    pred_w = np.exp(deltas[:, 2::4]) * src_w[:, None]
    pred_h = np.exp(deltas[:, 3::4]) * src_h[:, None]
    want[:, 0::4] = pred_cx - 0.5 * pred_w
    want[:, 1::4] = pred_cy - 0.5 * pred_h
    want[:, 2::4] = pred_cx + 0.5 * pred_w - 1
    want[:, 3::4] = pred_cy + 0.5 * pred_h - 1
    img_w, img_h = 320, 240
    want[:, 0::4] = np.maximum(want[:, 0::4], 0)
    want[:, 1::4] = np.maximum(want[:, 1::4], 0)
    want[:, 2::4] = np.minimum(want[:, 2::4], img_w - 1)
    want[:, 3::4] = np.minimum(want[:, 3::4], img_h - 1)

    got = B.decode_boxes(jnp.asarray(deltas), jnp.asarray(boxes), clip_exp=False)
    got = B.clip_boxes_to_image(got, (img_w, img_h))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


def test_clip_and_small_boxes():
    bx = jnp.asarray([[-5.0, -5.0, 500.0, 500.0], [10, 10, 12, 12]])
    clipped = B.clip_boxes_to_image(bx, (100, 80))
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 99, 79], [10, 10, 12, 12]]
    )
    mask = B.remove_small_boxes_mask(bx, min_size=4)
    assert mask.tolist() == [True, False]


def test_masked_iou(rng):
    a = random_boxes(rng, 4)
    b = random_boxes(rng, 4)
    va = jnp.asarray([True, True, False, True])
    vb = jnp.asarray([True, False, True, True])
    got = np.asarray(B.box_iou_masked(jnp.asarray(a), va, jnp.asarray(b), vb))
    assert (got[2, :] == 0).all() and (got[:, 1] == 0).all()
