"""XLA-friendly fixed-size NMS.

TPU-native replacement for maskrcnn-benchmark's CUDA ``nms`` (SURVEY.md §2.3),
used by the RPN postprocessor (``rpn/inference.py:116-121``) and the on-line
detection postprocessor (``OnlineDetectionPostProcessor.py:55-57``).

Design: scores are sorted once (descending); a precomputed [N, N] IoU matrix
feeds a sequential ``lax.fori_loop`` that marks each box suppressed if any
earlier *kept* box overlaps it above the threshold. All shapes static; invalid
rows (padding) carry score -inf and are never kept. For the framework's sizes
(N <= ~2000 pre-NMS) the IoU matrix is tiny (<16 MB) and lives comfortably
on-chip; the loop body is pure VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from online_detection_tpu.utils.boxes import box_iou

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_mask(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
) -> jax.Array:
    """Return a boolean keep-mask over the N input boxes (unsorted order).

    boxes: [N, 4] xyxy; scores: [N]; valid: [N] bool.
    Exactly matches sequential greedy NMS on the valid boxes sorted by
    descending score (ties broken by original index, like torch sort).
    """
    n = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores, stable=True)  # descending, stable
    sboxes = boxes[order]
    svalid = valid[order]

    iou = box_iou(sboxes, sboxes)  # [N, N]

    def body(i, state):
        keep, suppressed = state
        keep_i = svalid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        row = (iou[i] > iou_threshold) & keep_i
        suppressed = suppressed | row.at[i].set(False)
        return keep, suppressed

    keep0 = jnp.zeros((n,), bool)
    keep_sorted, _ = jax.lax.fori_loop(0, n, body, (keep0, keep0))
    # scatter back to input order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_out")
)
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    max_out: int,
):
    """Greedy NMS returning fixed-size top-``max_out`` results.

    Returns (boxes[max_out,4], scores[max_out], valid[max_out], idx[max_out])
    sorted by descending score; padding rows have valid=False, score=-inf.
    """
    n = boxes.shape[0]
    keep = nms_mask(boxes, scores, valid, iou_threshold)
    kept_scores = jnp.where(keep, scores, NEG_INF)
    k = min(max_out, n)
    top_scores, idx = jax.lax.top_k(kept_scores, k)
    if k < max_out:  # pad to the requested fixed size
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((max_out - k,), NEG_INF, top_scores.dtype)]
        )
        idx = jnp.concatenate([idx, jnp.zeros((max_out - k,), idx.dtype)])
    out_valid = top_scores > NEG_INF / 2
    out_boxes = boxes[idx] * out_valid[:, None].astype(boxes.dtype)
    return out_boxes, jnp.where(out_valid, top_scores, NEG_INF), out_valid, idx


def batched_class_nms(
    boxes: jax.Array,
    scores: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    max_out: int,
):
    """Per-class NMS vmapped over a leading class axis.

    boxes: [C, N, 4] (per-class decoded boxes), scores: [C, N], valid: [C, N].
    Mirrors the reference's per-class loop in
    ``OnlineDetectionPostProcessor.py:44-60`` but runs all classes in parallel.
    """
    return jax.vmap(nms, in_axes=(0, 0, 0, None, None))(
        boxes, scores, valid, iou_threshold, max_out
    )
