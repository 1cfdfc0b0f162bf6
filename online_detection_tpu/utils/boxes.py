"""Pure-JAX box geometry with the reference's +1-pixel conventions.

The reference inherits maskrcnn-benchmark's integer-pixel box convention:
widths/heights are computed as ``x2 - x1 + 1`` (``TO_REMOVE = 1``), both in
IoU (maskrcnn_benchmark boxlist_iou, used by
``rpn_getProposals.py`` / ``box_head_getProposals.py`` via
``compute_overlap_torch`` in ``mrcnn_modified/utils/evaluations.py:4-18``)
and in the box coder / decoder (``src/py_od_utils.py:247-274``).

All functions are shape-polymorphic pure functions on ``[..., 4]`` arrays in
``xyxy`` order and are jit/vmap-friendly. Variable-length box sets are
represented as fixed-capacity arrays plus boolean validity masks — XLA needs
static shapes, so the reference's dynamic per-image box counts become masked
fixed-max buffers throughout this codebase.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

TO_REMOVE = 1.0  # the reference's integer-pixel convention
# maskrcnn-benchmark clamps exp() args in BoxCoder.decode at log(1000/16)
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jax.Array) -> jax.Array:
    """Area with the +1 convention: (x2-x1+1)*(y2-y1+1). boxes: [..., 4]."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU: [N,4] x [K,4] -> [N,K], +1 convention.

    Matches maskrcnn_benchmark.structures.boxlist_ops.boxlist_iou, which is
    what the reference's anchor<->GT and proposal<->GT matching uses
    (``rpn_getProposals.py``, ``utils/evaluations.py:4-18``).
    """
    area_a = box_area(boxes_a)  # [N]
    area_b = box_area(boxes_b)  # [K]
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])  # [N,K,2]
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])  # [N,K,2]
    wh = jnp.clip(rb - lt + TO_REMOVE, 0.0)  # [N,K,2]
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_iou_masked(
    boxes_a: jax.Array,
    valid_a: jax.Array,
    boxes_b: jax.Array,
    valid_b: jax.Array,
) -> jax.Array:
    """Pairwise IoU where invalid rows/cols are forced to 0."""
    iou = box_iou(boxes_a, boxes_b)
    return iou * valid_a[:, None].astype(iou.dtype) * valid_b[None, :].astype(iou.dtype)


def encode_boxes(
    reference_boxes: jax.Array,
    proposals: jax.Array,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jax.Array:
    """Encode GT boxes w.r.t. proposals as (dx, dy, dw, dh) regression targets.

    Matches maskrcnn_benchmark BoxCoder.encode (+1 convention); the on-line
    COXY regression targets are computed with unit weights
    (``rpn_getProposals.py:408-454``).
    """
    wx, wy, ww, wh = weights
    # epsilon guard: degenerate (inverted) boxes only ever appear in masked
    # padding rows, but an inf/NaN there would still poison gradients
    ex_w = jnp.maximum(proposals[..., 2] - proposals[..., 0] + TO_REMOVE, 1e-6)
    ex_h = jnp.maximum(proposals[..., 3] - proposals[..., 1] + TO_REMOVE, 1e-6)
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = jnp.maximum(
        reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE, 1e-6
    )
    gt_h = jnp.maximum(
        reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE, 1e-6
    )
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jax.Array,
    boxes: jax.Array,
    weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    clip_exp: bool = True,
    src_size_offset: float = TO_REMOVE,
) -> jax.Array:
    """Decode (dx,dy,dw,dh) deltas against anchor/proposal boxes.

    deltas: [..., 4*K] against boxes [..., 4] -> [..., 4*K] (K classes packed
    along the last axis, as in maskrcnn_benchmark BoxCoder.decode and
    ``py_od_utils.decode_boxes_detector:247-274``).

    With ``clip_exp`` the dw/dh are clamped at log(1000/16) (stock box coder,
    used by the RPN postprocessor); the on-line detector decode
    (``decode_boxes_detector``) does NOT clamp — pass ``clip_exp=False`` there.

    ``src_size_offset``: the source width/height convention. The reference is
    inconsistent here: ``decode_boxes_detector`` uses ``x2 - x1 + 1`` while the
    standalone ``RegionPredictor`` uses ``x2 - x1 + np.spacing(1)``
    (``predict_regions.py:55-56``) — pass ``np.spacing(1)`` for that path.
    """
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0] + src_size_offset
    h = boxes[..., 3] - boxes[..., 1] + src_size_offset
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = deltas[..., 2::4] / ww
    dh = deltas[..., 3::4] / wh
    if clip_exp:
        dw = jnp.clip(dw, max=BBOX_XFORM_CLIP)
        dh = jnp.clip(dh, max=BBOX_XFORM_CLIP)

    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w - TO_REMOVE
    y2 = pred_cy + 0.5 * pred_h - TO_REMOVE
    # interleave back to [..., 4*K]
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., K, 4]
    return out.reshape(*deltas.shape[:-1], -1)


def clip_boxes_to_image(boxes: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """Clamp boxes to [0, W-1] x [0, H-1]. image_size is (width, height),
    matching BoxList.size ordering in the reference
    (``py_od_utils.py:269-272``). boxes: [..., 4] or [..., 4*K]."""
    w, h = image_size
    x = jnp.clip(boxes[..., 0::2], 0.0, w - TO_REMOVE)
    y = jnp.clip(boxes[..., 1::2], 0.0, h - TO_REMOVE)
    out = jnp.stack([x, y], axis=-1)  # [..., 2K, 2] -> interleave x,y
    return out.reshape(*boxes.shape[:-1], -1)


def clip_boxes_one_sided(boxes: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """The on-line detector's asymmetric clamp
    (``py_od_utils.decode_boxes_detector:269-272``, ``predict_regions.py:67-70``):
    x1/y1 clamped only from BELOW at 0, x2/y2 only from ABOVE at W-1/H-1 —
    unlike BoxList.clip_to_image there is no cross clamping, so a box fully
    outside the image keeps its out-of-range near coordinate. Kept verbatim
    for numerical parity. boxes: [..., 4] or [..., 4*K]."""
    w, h = image_size
    x1 = jnp.maximum(boxes[..., 0::4], 0.0)
    y1 = jnp.maximum(boxes[..., 1::4], 0.0)
    x2 = jnp.minimum(boxes[..., 2::4], w - TO_REMOVE)
    y2 = jnp.minimum(boxes[..., 3::4], h - TO_REMOVE)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # [..., K, 4]
    return out.reshape(*boxes.shape[:-1], -1)


def remove_small_boxes_mask(boxes: jax.Array, min_size: float) -> jax.Array:
    """Boolean mask of boxes with both sides >= min_size (+1 convention),
    mirroring maskrcnn_benchmark remove_small_boxes used in the RPN
    postprocessor (``rpn/inference.py``)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (w >= min_size) & (h >= min_size)
