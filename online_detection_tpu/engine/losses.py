"""Mask R-CNN training losses for the SGD baselines, fixed-shape.

Functional rebuild of the stock maskrcnn-benchmark losses the reference's
*baseline* trainers use (``modeling/rpn/loss.py``, box_head/loss.py,
mask_head/loss.py — the on-line pipeline itself is gradient-free):

- RPN: anchors matched at FG>=0.7 / BG<0.3 with low-quality matches allowed,
  256 samples/image at 0.5 positive fraction; BCE objectness + smooth-L1
  (beta=1/9) box deltas with unit box-coder weights.
- Box head: proposals (GT appended) matched at 0.5; 512 samples at 0.25
  positive fraction; softmax CE + smooth-L1 on the matched class's deltas
  with (10, 10, 5, 5) weights.
- Mask head: BCE between the predicted class channel and the 14x14-projected
  GT mask over positive samples.

Sampling uses masked random-priority top-k (fixed shapes, explicit PRNG).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.utils import boxes as box_ops


def smooth_l1(x: jax.Array, beta: float) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def match_boxes(
    iou: jax.Array,  # [G, N] (invalid gts masked to -1)
    high: float,
    low: float,
    allow_low_quality: bool,
) -> Tuple[jax.Array, jax.Array]:
    """maskrcnn Matcher: per column best gt; labels 1 (fg), 0 (bg),
    -1 (between). Low-quality: every gt's argmax column(s) become fg.
    Returns (matched_gt [N], labels [N])."""
    best = jnp.max(iou, axis=0)
    arg = jnp.argmax(iou, axis=0)
    labels = jnp.where(best >= high, 1, jnp.where(best < low, 0, -1))
    if allow_low_quality:
        per_gt_best = jnp.max(iou, axis=1, keepdims=True)  # [G, 1]
        is_best = (iou == per_gt_best) & (per_gt_best > 0)
        rescue = jnp.any(is_best, axis=0)
        labels = jnp.where(rescue, 1, labels)
    return arg, labels


def balanced_sample(
    key: jax.Array,
    labels: jax.Array,  # [N] in {-1, 0, 1}
    num: int,
    pos_fraction: float,
):
    """Random positive/negative subsample -> (mask_pos [N], mask_neg [N])."""
    kp, kn = jax.random.split(key)
    pos = labels == 1
    neg = labels == 0
    n_pos_want = int(num * pos_fraction)
    n_pos = jnp.minimum(jnp.sum(pos), n_pos_want)
    n_neg = jnp.minimum(jnp.sum(neg), num - n_pos)

    def pick(k, mask, n_take):
        pri = jax.random.uniform(k, mask.shape) - mask * 2.0  # valid first, random
        order = jnp.argsort(pri)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))
        return mask & (rank < n_take)

    return pick(kp, pos, n_pos), pick(kn, neg, n_neg)


def rpn_loss(
    key: jax.Array,
    logits: jax.Array,  # [N_anchors]
    deltas: jax.Array,  # [N_anchors, 4]
    anchors: jax.Array,  # [N_anchors, 4]
    visibility: jax.Array,  # [N_anchors]
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    batch_per_image: int = 256,
    pos_fraction: float = 0.5,
) -> jax.Array:
    iou = box_ops.box_iou(gt_boxes, anchors)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched, labels = match_boxes(iou, 0.7, 0.3, allow_low_quality=True)
    labels = jnp.where(visibility, labels, -1)  # straddle filter discards
    pos_m, neg_m = balanced_sample(key, labels, batch_per_image, pos_fraction)
    sampled = pos_m | neg_m
    n = jnp.maximum(jnp.sum(sampled), 1)

    targets = box_ops.encode_boxes(gt_boxes[matched], anchors)
    reg = smooth_l1(deltas - targets, beta=1.0 / 9.0).sum(-1)
    reg_loss = jnp.sum(reg * pos_m) / n

    ce = jnp.maximum(logits, 0) - logits * (labels == 1) + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    cls_loss = jnp.sum(ce * sampled) / n
    return cls_loss + reg_loss


class ROISample(NamedTuple):
    boxes: jax.Array  # [S, 4]
    labels: jax.Array  # [S] (0 = background)
    matched_gt: jax.Array  # [S]
    valid: jax.Array  # [S]
    is_pos: jax.Array  # [S]


def sample_rois(
    key: jax.Array,
    proposals: jax.Array,  # [P, 4]
    prop_valid: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    batch_per_image: int = 512,
    pos_fraction: float = 0.25,
) -> ROISample:
    """FastRCNN subsampling (GT boxes appended to proposals upstream)."""
    iou = box_ops.box_iou(gt_boxes, proposals)
    iou = jnp.where(
        (gt_valid[:, None]) & prop_valid[None, :], iou, -1.0
    )
    matched, mlabels = match_boxes(iou, 0.5, 0.5, allow_low_quality=False)
    mlabels = jnp.where(prop_valid, mlabels, -1)
    pos_m, neg_m = balanced_sample(key, mlabels, batch_per_image, pos_fraction)
    keep = pos_m | neg_m
    idx, valid = _compact_idx(keep, batch_per_image)
    is_pos = pos_m[idx] & valid
    labels = jnp.where(is_pos, gt_labels[matched[idx]], 0)
    return ROISample(
        boxes=proposals[idx],
        labels=labels,
        matched_gt=matched[idx],
        valid=valid,
        is_pos=is_pos,
    )


def _compact_idx(mask, n_out):
    n = mask.shape[0]
    cnt = jnp.sum(mask)
    order = jnp.argsort(~mask, stable=True)
    idx = order[jnp.minimum(jnp.arange(n_out), n - 1)]
    return idx, jnp.arange(n_out) < jnp.minimum(cnt, n_out)


def box_head_loss(
    cls_logits: jax.Array,  # [S, C+1]
    box_deltas: jax.Array,  # [S, 4*(C+1)]
    sample: ROISample,
    gt_boxes: jax.Array,
) -> jax.Array:
    n = jnp.maximum(jnp.sum(sample.valid), 1)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, sample.labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(ce * sample.valid) / n

    targets = box_ops.encode_boxes(
        gt_boxes[sample.matched_gt], sample.boxes, weights=(10.0, 10.0, 5.0, 5.0)
    )
    per_class = box_deltas.reshape(box_deltas.shape[0], -1, 4)
    sel = jnp.take_along_axis(
        per_class, sample.labels[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    reg = smooth_l1(sel - targets, beta=1.0).sum(-1)
    reg_loss = jnp.sum(reg * sample.is_pos) / n
    return cls_loss + reg_loss


def mask_head_loss(
    mask_logits: jax.Array,  # [S, 14, 14, C+1]
    sample: ROISample,
    gt_masks_14: jax.Array,  # [S, 14, 14] projected GT masks for the samples
) -> jax.Array:
    sel = jnp.take_along_axis(
        mask_logits, sample.labels[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    ce = (
        jnp.maximum(sel, 0)
        - sel * gt_masks_14
        + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    ).mean(axis=(1, 2))
    n = jnp.maximum(jnp.sum(sample.is_pos), 1)
    return jnp.sum(ce * sample.is_pos) / n
