"""Detection + mask postprocessing, fixed-shape.

Rebuilds ``OnlineDetectionPostProcessor`` (``accuracy-evaluator/
OnlineDetectionPostProcessor.py:11-79``) and ``MaskPostProcessor``
(``mask_head/inference.py:27-61``):

detection: per-class decode (NO exp clipping — ``decode_boxes_detector``,
``py_od_utils.py:247-274``) -> clip to image -> threshold ``score > -2.0``
-> per-class NMS 0.3 -> global top-100 across classes. Outputs are
fixed-size padded arrays with validity masks; the per-class NMS runs as one
vmapped batch instead of the reference's class loop.

mask: select each detection's label channel from the [R, C+1, 14, 14]
per-pixel score map and apply sigmoid -> [R, 14, 14] probabilities. Pasting
to full image resolution (the reference's ``Masker``) lives in
data/evaluation (host side, like the reference's CPU paste).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.ops.nms import batched_class_nms
from online_detection_tpu.utils import boxes as box_ops

NEG_INF = -1e30


class Detections(NamedTuple):
    boxes: jax.Array  # [D, 4]
    scores: jax.Array  # [D]
    labels: jax.Array  # [D] int32 (1..C; 0 = padding)
    valid: jax.Array  # [D] bool


@functools.partial(
    jax.jit,
    static_argnames=("score_thresh", "nms_thresh", "detections_per_img", "per_class_cap"),
)
def postprocess_detections(
    proposals: jax.Array,  # [R, 4]
    proposals_valid: jax.Array,  # [R]
    scores: jax.Array,  # [R, C+1] (col 0 background)
    deltas: jax.Array,  # [R, (C+1)*4]
    image_size: Tuple[int, int] | jax.Array,  # (width, height)
    score_thresh: float = -2.0,
    nms_thresh: float = 0.3,
    detections_per_img: int = 100,
    per_class_cap: int = 100,
) -> Detections:
    n_cls = scores.shape[1]  # C+1
    refined = box_ops.decode_boxes(deltas, proposals, clip_exp=False)
    # decode_boxes_detector's asymmetric clamp (py_od_utils.py:269-272)
    refined = box_ops.clip_boxes_one_sided(refined, image_size)  # [R, (C+1)*4]
    per_class_boxes = refined.reshape(-1, n_cls, 4).transpose(1, 0, 2)  # [C+1, R, 4]
    per_class_scores = scores.T  # [C+1, R]
    keep = (per_class_scores > score_thresh) & proposals_valid[None, :]
    # background (class 0) never kept — its fixed -2 score fails the strict
    # threshold anyway, but make it explicit
    keep = keep.at[0].set(False)

    b, s, v, _ = batched_class_nms(
        per_class_boxes, per_class_scores, keep, nms_thresh, per_class_cap
    )  # [C+1, cap, ...]

    flat_scores = jnp.where(v, s, NEG_INF).reshape(-1)
    flat_boxes = b.reshape(-1, 4)
    labels = jnp.broadcast_to(
        jnp.arange(n_cls, dtype=jnp.int32)[:, None], (n_cls, per_class_cap)
    ).reshape(-1)

    top_scores, idx = jax.lax.top_k(flat_scores, detections_per_img)
    out_valid = top_scores > NEG_INF / 2
    return Detections(
        boxes=flat_boxes[idx] * out_valid[:, None],
        scores=jnp.where(out_valid, top_scores, 0.0),
        labels=jnp.where(out_valid, labels[idx], 0),
        valid=out_valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=("score_thresh", "nms_thresh", "detections_per_img", "per_class_cap"),
)
def postprocess_detections_standalone(
    refined_boxes: jax.Array,  # [R, (C+1)*4] — RegionPredictor output, class 0 = raw boxes
    scores: jax.Array,  # [R, C+1] (col 0 background, fixed -1)
    valid: jax.Array,  # [R]
    image_size: Tuple[int, int] | jax.Array,  # (width, height)
    score_thresh: float = -2.0,
    nms_thresh: float = 0.3,
    detections_per_img: int = 100,
    per_class_cap: int = 100,
) -> Detections:
    """The standalone postprocessor for the cached-test_boxes path
    (``OnlineDetectionPostProcessor_standalone.py:10-103`` +
    ``AccuracyEvaluator.py:20-43``): boxes arrive ALREADY refined per class
    (``predict_regions.py:16-80`` layout [R, C+1, 4] flattened, class 0 =
    the raw example boxes) instead of as deltas.

    Two deliberate differences from ``postprocess_detections`` above, both
    the reference standalone file's own semantics:

    - clip is ``BoxList.clip_to_image``'s two-sided clamp (the in-model
      variant uses ``decode_boxes_detector``'s one-sided clamp);
    - the global cap keeps score TIES at the k-th value (``torch.kthvalue``
      + ``>=`` keep, ``:97-103``), so more than ``detections_per_img`` rows
      can survive — the output therefore stays at full [C+1, per_class_cap]
      capacity with a validity mask rather than compacting to exactly k.
    """
    n_cls = scores.shape[1]  # C+1
    boxes = box_ops.clip_boxes_to_image(refined_boxes, image_size)
    per_class_boxes = boxes.reshape(-1, n_cls, 4).transpose(1, 0, 2)  # [C+1, R, 4]
    per_class_scores = scores.T  # [C+1, R]
    keep = (per_class_scores > score_thresh) & valid[None, :]
    keep = keep.at[0].set(False)  # background never kept (loop starts at j=1)

    b, s, v, _ = batched_class_nms(
        per_class_boxes, per_class_scores, keep, nms_thresh, per_class_cap
    )  # [C+1, cap, ...]

    flat_scores = jnp.where(v, s, NEG_INF).reshape(-1)
    flat_boxes = b.reshape(-1, 4)
    labels = jnp.broadcast_to(
        jnp.arange(n_cls, dtype=jnp.int32)[:, None], (n_cls, per_class_cap)
    ).reshape(-1)

    survived = flat_scores > NEG_INF / 2
    if 0 < detections_per_img < flat_scores.shape[0]:
        n_det = jnp.sum(survived)
        kth = jax.lax.top_k(flat_scores, detections_per_img)[0][-1]
        out_valid = survived & jnp.where(
            n_det > detections_per_img, flat_scores >= kth, True
        )
    else:
        out_valid = survived
    return Detections(
        boxes=flat_boxes * out_valid[:, None].astype(flat_boxes.dtype),
        scores=jnp.where(out_valid, flat_scores, 0.0),
        labels=jnp.where(out_valid, labels, 0),
        valid=out_valid,
    )


@jax.jit
def select_mask_channel(mask_scores: jax.Array, labels: jax.Array) -> jax.Array:
    """[R, 14, 14, C+1] scores + [R] labels -> [R, 14, 14] sigmoid probs
    (``MaskPostProcessor``: x.sigmoid() then index by predicted label)."""
    r = mask_scores.shape[0]
    sel = jnp.take_along_axis(
        mask_scores, labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel)
