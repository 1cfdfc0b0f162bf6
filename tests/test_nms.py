"""NMS vs brute-force greedy reference (the CUDA nms semantics the reference
uses via boxlist_nms)."""

import numpy as np
import jax.numpy as jnp

from online_detection_tpu.ops.nms import nms, nms_mask, batched_class_nms
from tests.test_boxes import random_boxes


def greedy_nms_np(boxes, scores, thresh):
    """Sequential greedy NMS with the +1 IoU convention, returning kept
    indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            bj = boxes[j]
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0]) + 1
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1]) + 1
            inter = max(iw, 0) * max(ih, 0)
            ai = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
            aj = (bj[2] - bj[0] + 1) * (bj[3] - bj[1] + 1)
            if inter / (ai + aj - inter) > thresh:
                suppressed[j] = True
    return keep


def test_nms_matches_greedy(rng):
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n, size=100.0)
        scores = rng.normal(size=n).astype(np.float32)
        want = set(greedy_nms_np(boxes, scores, 0.3))
        got_mask = np.asarray(
            nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.3)
        )
        assert set(np.nonzero(got_mask)[0].tolist()) == want


def test_nms_respects_validity_and_maxout(rng):
    n = 32
    boxes = random_boxes(rng, n)
    scores = rng.normal(size=n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::3] = False
    want = set(greedy_nms_np(boxes[valid], scores[valid], 0.5))
    valid_idx = np.nonzero(valid)[0]
    want = {valid_idx[i] for i in want}
    ob, os_, ov, oi = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 10
    )
    got = set(np.asarray(oi)[np.asarray(ov)].tolist())
    assert got <= want and len(got) == min(10, len(want))
    # output sorted descending
    s = np.asarray(os_)[np.asarray(ov)]
    assert (np.diff(s) <= 1e-6).all()


def test_batched_class_nms(rng):
    c, n = 3, 40
    boxes = np.stack([random_boxes(rng, n) for _ in range(c)])
    scores = rng.normal(size=(c, n)).astype(np.float32)
    valid = np.ones((c, n), bool)
    ob, os_, ov, oi = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3, 8
    )
    assert ob.shape == (c, 8, 4)
    for ci in range(c):
        want = greedy_nms_np(boxes[ci], scores[ci], 0.3)[:8]
        got = np.asarray(oi[ci])[np.asarray(ov[ci])]
        assert got.tolist() == want
