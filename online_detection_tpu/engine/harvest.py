"""Feature harvesting: the training-time extraction pass, as pure functions.

Rebuilds the reference's ``*_getProposals`` meta-architectures
(``generalized_rcnn_getProposals.py``, ``rpn_getProposals.py:180-463``,
``box_head_getProposals.py:107-292``, ``mask_head_getProposals.py:83-143``)
with the architectural inversion SURVEY.md §1 prescribes: instead of
accumulating features on module attributes, a **jitted per-image function
returns fixed-size masked chunks** which an accumulator folds into per-class
reservoirs.

Per image, with GT boxes prepended to the RPN proposals
(``generalized_rcnn_getProposals.py:90-96``):

- RPN (per anchor-shape class a in 0..A-1, ``rpn_getProposals.py``):
  * negatives: visible anchors with best-IoU < NEG_IOU(0.3); sampled
    ``negatives_to_pick = ceil(B*I/num_images)`` with replacement when
    overfull, all rows otherwise;
  * positives: IoU > POS_IOU(0.7) plus, for each GT with no such anchor, the
    max-IoU anchors assigned to it ("GT rescue");
  * COXY: encode(assigned GT, anchor), class = anchor shape.
- Detector (per target class c, ``box_head_getProposals.py``): positives =
  the GT rows' own 2048-d features; negatives = rows with per-class IoU <
  0.3 when the class is present in the image, ANY rows otherwise, sampled
  with replacement; COXY = rows with IoU > REGRESSORS.MIN_OVERLAP(0.6)
  assigned to the GT (targets vs the *clamped* boxes, like the reference).
- Segmentation (per GT, ``mask_head_getProposals.py``): conv5_mask features
  of the GT rows; GT mask cropped+resized to 14x14; pixels >= 0.5 are
  positives; both sides subsampled by SAMPLING_FACTOR via random
  permutation (floor(f*n), without replacement).

All randomness is explicit PRNG keys (the reference uses unseeded torch
sampling — statistical, not bitwise, parity; SURVEY.md "hard parts").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.models import resnet
from online_detection_tpu.models.detector import DetectorConfig, rpn_scores_deltas
from online_detection_tpu.models.heads import mask_deconv
from online_detection_tpu.models.rpn import OnlineRPNModels, propose, rpn_features
from online_detection_tpu.ops.roi_align import roi_align
from online_detection_tpu.utils import boxes as box_ops


class HarvestConfig(NamedTuple):
    """Static shapes/knobs for the harvesting pass."""

    num_anchor_classes: int = 15
    num_classes: int = 21
    negatives_to_pick: int = 10  # ceil(B*I / num_images), per run
    rpn_neg_iou: float = 0.3
    rpn_pos_iou: float = 0.7
    det_neg_iou: float = 0.3
    reg_min_overlap: float = 0.6
    gt_cap: int = 20  # max GT boxes per image
    rpn_pos_cap: int = 64  # per-class positive-anchor slots per image
    coxy_cap: int = 256  # detector regression rows per image
    mask_pix_cap: int = 64  # sampled pixels per GT per polarity
    sampling_factor: float = 0.3
    extract_only_gt_positives: bool = True
    # Differential-test mode: replace the PRNG draws with the pinned index
    # scheme of tests/ref_shims.deterministic_torch_sampling
    # (randint -> arange % n, randperm -> reversed arange) so picks are
    # bit-identical to the literal reference harvesting code driven with the
    # same shims. Production runs keep explicit PRNG keys.
    parity_sampling: bool = False


class RPNChunk(NamedTuple):
    neg: jax.Array  # [A, NPICK, 1024]
    neg_valid: jax.Array  # [A, NPICK]
    pos: jax.Array  # [A, PPOS, 1024]
    pos_valid: jax.Array  # [A, PPOS]
    coxy_y: jax.Array  # [A, PPOS, 4] regression targets for the positives
    pos_dropped: jax.Array  # [A] positives lost to the per-image PPOS cap


class DetChunk(NamedTuple):
    pos: jax.Array  # [G, 2048] GT-row features
    pos_labels: jax.Array  # [G] 1-based class labels
    pos_valid: jax.Array  # [G]
    neg: jax.Array  # [C, NPICK, 2048]
    neg_valid: jax.Array  # [C, NPICK]
    coxy_x: jax.Array  # [COXY_CAP, 2048]
    coxy_y: jax.Array  # [COXY_CAP, 4]
    coxy_c: jax.Array  # [COXY_CAP] 1-based labels
    coxy_valid: jax.Array  # [COXY_CAP]
    coxy_dropped: jax.Array  # scalar: COXY rows lost to the per-image cap


class MaskChunk(NamedTuple):
    pos: jax.Array  # [G, PIX, 256]
    pos_valid: jax.Array  # [G, PIX]
    neg: jax.Array  # [G, PIX, 256]
    neg_valid: jax.Array  # [G, PIX]
    labels: jax.Array  # [G] 1-based
    labels_valid: jax.Array  # [G]
    dropped: jax.Array  # scalar: sampled pixels lost to the PIX cap


class HarvestChunk(NamedTuple):
    rpn: Optional[RPNChunk]
    det: DetChunk
    mask: Optional[MaskChunk]
    average_recall: jax.Array  # scalar AR of this image's proposals


def masked_sample(
    key: jax.Array,
    mask: jax.Array,
    n_out: int,
    parity: bool = False,
    always_resample: bool = False,
):
    """Reference-style sampling from a masked pool: all rows when
    count <= n_out, n_out draws WITH replacement otherwise
    (torch.randint semantics in ``rpn_getProposals.py:287``).
    Returns (indices [n_out], valid [n_out]).

    Known intentional deviation from the reference's DETECTOR head
    (``box_head_getProposals.py:235-240``): there the pool is resampled with
    replacement even when count <= n_out, emitting duplicate rows; this
    implementation takes each row once (duplicates add no information to the
    FALKON caches — statistical, not bitwise, parity per SURVEY.md
    "Randomness"). The RPN head (``rpn_getProposals.py:285-287``) samples
    only when overfull, which both sides implement identically.

    ``parity=True`` replaces the draws with the pinned scheme of
    ``tests/ref_shims.deterministic_torch_sampling`` (randint -> arange % n):
    with ``always_resample`` it reproduces the detector head's picks exactly
    (pool rows cycled to n_out with duplicates), without it the RPN head's
    (first n_out pool rows)."""
    n = mask.shape[0]
    cnt = jnp.sum(mask)
    order = jnp.argsort(~mask, stable=True)  # valid rows first
    slot = jnp.arange(n_out)
    if parity:
        if always_resample:
            take = slot % jnp.maximum(cnt, 1)
            valid = jnp.broadcast_to(cnt > 0, slot.shape)
        else:
            take = jnp.minimum(slot, jnp.maximum(cnt - 1, 0))
            valid = slot < jnp.minimum(cnt, n_out)
    else:
        draws = jax.random.randint(key, (n_out,), 0, jnp.maximum(cnt, 1))
        take = jnp.where(
            cnt > n_out, draws, jnp.minimum(slot, jnp.maximum(cnt - 1, 0))
        )
        valid = slot < jnp.minimum(cnt, n_out)
    idx = order[jnp.clip(take, 0, n - 1)]
    return idx, valid


def compact(mask: jax.Array, n_out: int):
    """Valid-first compaction (deterministic truncation at n_out)."""
    n = mask.shape[0]
    cnt = jnp.sum(mask)
    order = jnp.argsort(~mask, stable=True)
    idx = order[jnp.minimum(jnp.arange(n_out), n - 1)]
    valid = jnp.arange(n_out) < jnp.minimum(cnt, n_out)
    return idx, valid


def random_subsample(
    key: jax.Array, mask: jax.Array, frac: float, n_out: int,
    parity: bool = False,
):
    """randperm(count)[:floor(frac*count)] — without replacement
    (``mask_head_getProposals.py:115-118``). Returns (idx [n_out], valid).

    ``parity=True``: pinned randperm (reversed arange, matching
    ``tests/ref_shims.deterministic_torch_sampling``) — picks become the LAST
    floor(frac*count) valid rows in descending row order, exactly the literal
    reference's picks under the same shim."""
    n = mask.shape[0]
    cnt = jnp.sum(mask)
    if parity:
        pri = -jnp.arange(n, dtype=jnp.float32) + (~mask) * 1e9
    else:
        pri = jax.random.uniform(key, (n,)) + (~mask) * 1e9  # random order, valid first
    order = jnp.argsort(pri)
    take = jnp.floor(frac * cnt).astype(jnp.int32)
    idx = order[jnp.minimum(jnp.arange(n_out), n - 1)]
    valid = jnp.arange(n_out) < jnp.minimum(take, n_out)
    return idx, valid


# --------------------------------------------------------------------------
# RPN harvesting


def harvest_rpn(
    key: jax.Array,
    t: jax.Array,  # [H, W, 1024] RPN conv features
    anchors: jax.Array,  # [HW*A, 4]
    visibility: jax.Array,  # [HW*A] straddle filter for the true image size
    gt_boxes: jax.Array,  # [G, 4]
    gt_valid: jax.Array,  # [G]
    cfg: HarvestConfig,
) -> RPNChunk:
    a_cls = cfg.num_anchor_classes
    h, w, ch = t.shape
    feats_flat = t.reshape(h * w, ch)
    iou = box_ops.box_iou(gt_boxes, anchors)  # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_iou = jnp.max(iou, axis=0)
    best_gt = jnp.argmax(iou, axis=0)
    best_iou = jnp.maximum(best_iou, 0.0)  # no-valid-gt -> 0

    neg_pool = visibility & (best_iou < cfg.rpn_neg_iou)
    pos_hi = visibility & (best_iou > cfg.rpn_pos_iou)

    # GT rescue: for each valid GT with no >thresh anchor, add the max-IoU
    # anchors assigned to it (``rpn_getProposals.py:369-383``)
    def rescue_for_gt(g):
        covered = jnp.any(pos_hi & (best_gt == g))
        cand = visibility & (best_gt == g)
        maxv = jnp.max(jnp.where(cand, best_iou, -1.0))
        res = cand & (best_iou == maxv) & gt_valid[g] & ~covered
        return res

    rescue = jnp.any(jax.vmap(rescue_for_gt)(jnp.arange(gt_boxes.shape[0])), axis=0)
    pos_pool = pos_hi | rescue

    keys = jax.random.split(key, a_cls)

    # Per-class sampling on the class's OWN [HW] column instead of a
    # class-strided mask over the full [HW*A] axis: anchor n <-> (loc = n//A,
    # cls = n%A), so reshaping to [HW, A] makes column a exactly class a's
    # pool in the same (loc-ascending = global-ascending) order — identical
    # picks, but the argsorts inside masked_sample/compact run on HW rows
    # instead of HW*A (15x less sort work; the sort was the bulk of the
    # per-image sampling cost on v5e).
    neg_pool2 = neg_pool.reshape(h * w, a_cls)
    pos_pool2 = pos_pool.reshape(h * w, a_cls)
    best_gt2 = best_gt.reshape(h * w, a_cls)

    def per_class(a, k):
        neg_loc, neg_valid = masked_sample(
            k, neg_pool2[:, a], cfg.negatives_to_pick,
            parity=cfg.parity_sampling,
        )
        pos_loc, pos_valid = compact(pos_pool2[:, a], cfg.rpn_pos_cap)
        neg_feats = feats_flat[neg_loc]
        pos_feats = feats_flat[pos_loc]
        pos_idx = pos_loc * a_cls + a  # global anchor index
        targets = box_ops.encode_boxes(
            gt_boxes[best_gt2[pos_loc, a]], anchors[pos_idx]
        )
        dropped = jnp.maximum(jnp.sum(pos_pool2[:, a]) - cfg.rpn_pos_cap, 0)
        return neg_feats, neg_valid, pos_feats, pos_valid, targets, dropped

    neg, negv, pos, posv, coxy_y, posd = jax.vmap(per_class)(jnp.arange(a_cls), keys)
    return RPNChunk(neg, negv, pos, posv, coxy_y, posd)


# --------------------------------------------------------------------------
# Detector harvesting


def harvest_detector(
    key: jax.Array,
    feats: jax.Array,  # [R, 2048] pooled features, GT rows first
    boxes: jax.Array,  # [R, 4] (GT prepended), image coords
    rows_valid: jax.Array,  # [R]
    gt_labels: jax.Array,  # [G] 1-based
    gt_valid: jax.Array,  # [G]
    image_size,  # (width, height)
    cfg: HarvestConfig,
) -> DetChunk:
    g_cap = cfg.gt_cap
    n_cls = cfg.num_classes
    r = feats.shape[0]
    boxes = box_ops.clip_boxes_to_image(boxes, image_size)
    gt_boxes = boxes[:g_cap]

    iou_gt = box_ops.box_iou(gt_boxes, boxes)  # [G, R]
    iou_gt = jnp.where((gt_valid[:, None]) & rows_valid[None, :], iou_gt, 0.0)
    # per-class overlap: max over GTs of that class
    cls_onehot = jax.nn.one_hot(gt_labels - 1, n_cls, dtype=iou_gt.dtype)  # [G, C]
    cls_onehot = cls_onehot * gt_valid[:, None]
    overlap = jnp.max(iou_gt[:, :, None] * cls_onehot[:, None, :], axis=0)  # [R, C]
    # associated GT: strictly-greater update -> first max wins (= argmax)
    assoc = jnp.argmax(iou_gt, axis=0)  # [R]
    assoc_iou = jnp.max(iou_gt, axis=0)

    # positives: the GT rows' own features
    pos = feats[:g_cap]
    pos_valid = gt_valid & rows_valid[:g_cap]

    # COXY: rows assigned to GT i with per-class overlap > 0.6
    assoc_cls = gt_labels[assoc] - 1  # [R] 0-based class of assigned GT
    per_row_ov = jnp.take_along_axis(overlap, assoc_cls[:, None], axis=1)[:, 0]
    coxy_mask = rows_valid & gt_valid[assoc] & (per_row_ov > cfg.reg_min_overlap) & (
        assoc_iou > 0.0
    )
    kc, kn = jax.random.split(key)
    cidx, cvalid = compact(coxy_mask, cfg.coxy_cap)
    coxy_x = feats[cidx]
    coxy_y = box_ops.encode_boxes(gt_boxes[assoc[cidx]], boxes[cidx])
    coxy_c = (assoc_cls[cidx] + 1).astype(jnp.float32)

    # negatives per class
    present = jnp.zeros((n_cls,), bool).at[
        jnp.clip(gt_labels - 1, 0, n_cls - 1)
    ].max(gt_valid)

    nkeys = jax.random.split(kn, n_cls)

    def per_class(c, k):
        pool_present = rows_valid & (overlap[:, c] < cfg.det_neg_iou)
        pool = jnp.where(present[c], pool_present, rows_valid)
        idx, valid = masked_sample(
            k, pool, cfg.negatives_to_pick,
            parity=cfg.parity_sampling, always_resample=True,
        )
        # class present but zero sub-threshold rows -> nothing harvested
        valid = valid & jnp.where(
            present[c], jnp.sum(pool_present) > 0, True
        )
        return feats[idx], valid

    neg, negv = jax.vmap(per_class)(jnp.arange(n_cls), nkeys)
    coxy_dropped = jnp.maximum(jnp.sum(coxy_mask) - cfg.coxy_cap, 0)
    return DetChunk(
        pos, gt_labels, pos_valid, neg, negv, coxy_x, coxy_y, coxy_c, cvalid,
        coxy_dropped,
    )


# --------------------------------------------------------------------------
# Segmentation harvesting


def project_mask_on_box(mask: jax.Array, box: jax.Array, out: int = 14) -> jax.Array:
    """Crop ``mask`` [H, W] to ``box`` and resize to [out, out] (bilinear),
    the jit-able equivalent of ``project_masks_on_boxes`` (the reference's
    flagged CPU bottleneck, ``mask_head_getProposals.py:16-46``).

    Implemented as a separable sampling matrix (same trick as RoIAlign):
    output pixel (i, j) samples the mask at the center of the (i, j) cell of
    the box grid.
    """
    h, w = mask.shape
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1 + 1.0, 1.0)
    bh = jnp.maximum(y2 - y1 + 1.0, 1.0)

    def axis_weights(start, size, dim):
        # sample positions: start + (k + .5)/out * size - .5 (pixel centers)
        ks = jnp.arange(out, dtype=jnp.float32)
        pos = start + (ks + 0.5) / out * size - 0.5
        pos = jnp.clip(pos, 0.0, dim - 1.0)
        low = jnp.floor(pos)
        frac = pos - low
        grid = jnp.arange(dim, dtype=jnp.float32)[None, :]
        w_low = (grid == low[:, None]) * (1.0 - frac[:, None])
        w_high = (grid == low[:, None] + 1.0) * frac[:, None]
        return w_low + w_high  # [out, dim]

    wy = axis_weights(y1, bh, h)
    wx = axis_weights(x1, bw, w)
    return jnp.einsum("ih,hw,jw->ij", wy, mask.astype(jnp.float32), wx)


def harvest_mask(
    key: jax.Array,
    deconv_feats: jax.Array,  # [G, 14, 14, 256] conv5_mask of GT rows
    gt_masks_14: jax.Array,  # [G, 14, 14] GT masks pre-projected to the grid
    gt_labels: jax.Array,  # [G]
    gt_valid: jax.Array,  # [G]
    cfg: HarvestConfig,
) -> MaskChunk:
    """Pixel sampling from pre-projected masks. Projection itself is cheap
    and host-side (data/mask_project.py) so only [G, 14, 14] floats cross the
    host->device link; ``project_mask_on_box`` below is the on-device twin
    used when masks are already resident."""
    g, mh, mw, ch = deconv_feats.shape
    pix_pos = (gt_masks_14 >= 0.5).reshape(g, mh * mw)
    feats = deconv_feats.reshape(g, mh * mw, ch)

    keys = jax.random.split(key, 2 * g).reshape(g, 2)

    def per_gt(f, pospix, ks, valid):
        pi, pv = random_subsample(
            ks[0], pospix, cfg.sampling_factor, cfg.mask_pix_cap,
            parity=cfg.parity_sampling,
        )
        ni, nv = random_subsample(
            ks[1], ~pospix, cfg.sampling_factor, cfg.mask_pix_cap,
            parity=cfg.parity_sampling,
        )
        want = (jnp.floor(cfg.sampling_factor * jnp.sum(pospix))
                + jnp.floor(cfg.sampling_factor * jnp.sum(~pospix))).astype(jnp.int32)
        got = jnp.sum(pv & valid) + jnp.sum(nv & valid)
        dropped = jnp.maximum(want * valid - got, 0)
        return f[pi], pv & valid, f[ni], nv & valid, dropped

    pos, posv, neg, negv, dropped = jax.vmap(per_gt)(feats, pix_pos, keys, gt_valid)
    return MaskChunk(pos, posv, neg, negv, gt_labels, gt_valid, jnp.sum(dropped))


# --------------------------------------------------------------------------
# Full per-image pass


def average_recall(gt_boxes, gt_valid, prop_boxes, prop_valid):
    """AR = 2 * mean_gt(max(best_iou - 0.5, 0)) (``average_recall.py:5-10``)."""
    iou = box_ops.box_iou_masked(gt_boxes, gt_valid, prop_boxes, prop_valid)
    best = jnp.max(iou, axis=1)
    vals = jnp.maximum(best - 0.5, 0.0) * gt_valid
    n = jnp.maximum(jnp.sum(gt_valid), 1)
    return 2.0 * jnp.sum(vals) / n


def harvest_trunk(
    params,
    online_rpn: Optional[OnlineRPNModels],
    anchors: jax.Array,  # [HW*A, 4]
    image: jax.Array,  # [H, W, 3] padded canvas
    image_size: jax.Array,  # (width, height)
    gt_boxes: jax.Array,  # [G, 4]
    gt_valid: jax.Array,  # [G]
    dcfg: DetectorConfig = DetectorConfig(),
    with_mask_features: bool = True,
):
    """The CNN half of the harvesting pass: backbone -> RPN conv -> proposals
    -> (GT ++ proposals) RoI features. Returns
    (t [h,w,1024], prop_boxes, prop_valid, feats [R,2048], deconv [G,14,14,256]).

    Kept as its own jit unit: fusing the conv trunk with the sampling stages
    into one program sends the TPU compiler into a pathological fusion search
    (hours), while the two halves compile in seconds each.
    """
    from online_detection_tpu.data.transforms import normalize_canvas
    from online_detection_tpu.models.detector import resolve_compute_dtype

    # bf16 conv trunk on TPU (see DetectorConfig.compute_dtype); the chunk-
    # facing outputs below are cast back to f32 so reservoirs and solver math
    # are bit-for-bit the f32 pipeline (on bf16-rounded activations).
    image = normalize_canvas(image).astype(resolve_compute_dtype(dcfg))
    c4 = resnet.backbone_c4(params["backbone"], image[None])
    t = rpn_features(params["rpn"], c4)[0]

    # proposals: pretrained conv head (propagate_rpn_boxes) or injected
    # on-line RPN (serial pipeline, ``extract_features_detector.py``)
    scores, deltas = rpn_scores_deltas(params["rpn"], online_rpn, t)
    prop_boxes, _, prop_valid = propose(
        scores, deltas, anchors, image_size,
        pre_nms_top_n=dcfg.pre_nms_top_n, post_nms_top_n=dcfg.post_nms_top_n,
        nms_thresh=dcfg.rpn_nms_thresh, min_size=dcfg.rpn_min_size,
    )

    # GT prepended to proposals (``generalized_rcnn_getProposals.py:90-96``)
    all_boxes = jnp.concatenate([gt_boxes, prop_boxes], axis=0)
    pooled = roi_align(
        c4[0], all_boxes, dcfg.pooler_resolution, dcfg.pooler_resolution,
        dcfg.pooler_scale, roi_chunk=dcfg.roi_chunk,
    )
    res5 = resnet.res5_feature_map(params["backbone"], pooled)  # [R,7,7,2048]
    feats = jnp.mean(res5.astype(jnp.float32), axis=(1, 2))  # [R, 2048]

    deconv = None
    if with_mask_features:
        # Recompute res5 on just the G GT rows for the mask head instead of
        # slicing the full map: a second consumer of ``res5`` forces XLA to
        # materialize the whole [R, 7, 7, 2048] tensor in HBM (~61 MB/img at
        # R=308), while the single-consumer form fuses the avg-pool into the
        # conv chain. The G-row recompute costs ~12 GFLOP (~0.06 ms) and buys
        # 1.2 ms/img on v5e (measured: trunk 6.75 -> 5.56 ms/img at batch 8).
        # Convs are row-independent, so this is semantics-preserving (bf16
        # accumulation order may differ, as it already does across batch
        # shapes).
        g_cap = gt_boxes.shape[0]
        deconv = mask_deconv(
            params["mask_head"],
            resnet.res5_feature_map(params["backbone"], pooled[:g_cap]),
        )
    return t.astype(jnp.float32), prop_boxes, prop_valid, feats, deconv


def harvest_chunks(
    key: jax.Array,
    t: jax.Array,
    prop_boxes: jax.Array,
    prop_valid: jax.Array,
    feats: jax.Array,
    deconv: Optional[jax.Array],
    anchors: jax.Array,
    visibility: jax.Array,
    image_size: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    gt_masks_14: Optional[jax.Array],  # [G, 14, 14] pre-projected GT masks
    hcfg: HarvestConfig,
    with_rpn: bool = True,
) -> HarvestChunk:
    """The sampling half: anchor matching + minibootstrap chunk extraction."""
    k_rpn, k_det, k_mask = jax.random.split(key, 3)
    rpn_chunk = None
    if with_rpn:
        rpn_chunk = harvest_rpn(
            k_rpn, t, anchors, visibility, gt_boxes, gt_valid, hcfg
        )
    ar = average_recall(gt_boxes, gt_valid, prop_boxes, prop_valid)
    all_boxes = jnp.concatenate([gt_boxes, prop_boxes], axis=0)
    rows_valid = jnp.concatenate([gt_valid, prop_valid], axis=0)
    det_chunk = harvest_detector(
        k_det, feats, all_boxes, rows_valid, gt_labels, gt_valid, image_size, hcfg
    )
    mask_chunk = None
    if gt_masks_14 is not None and deconv is not None:
        mask_chunk = harvest_mask(
            k_mask, deconv, gt_masks_14, gt_labels, gt_valid, hcfg
        )
    return HarvestChunk(rpn_chunk, det_chunk, mask_chunk, ar)


def harvest_image(
    key: jax.Array,
    params,
    online_rpn: Optional[OnlineRPNModels],
    anchors: jax.Array,  # [HW*A, 4] canvas anchor grid
    visibility: jax.Array,  # [HW*A] straddle filter (true image size)
    image: jax.Array,  # [H, W, 3] padded canvas
    image_size: jax.Array,  # (width, height)
    gt_boxes: jax.Array,  # [G, 4]
    gt_labels: jax.Array,  # [G]
    gt_valid: jax.Array,  # [G]
    gt_masks: Optional[jax.Array],  # [G, H, W] or None
    hcfg: HarvestConfig,
    dcfg: DetectorConfig = DetectorConfig(),
    with_rpn: bool = True,
) -> HarvestChunk:
    """One harvesting forward pass (trunk + chunks composed; see
    harvest_trunk for why the pipeline jits the halves separately)."""
    t, prop_boxes, prop_valid, feats, deconv = harvest_trunk(
        params, online_rpn, anchors, image, image_size, gt_boxes, gt_valid,
        dcfg, with_mask_features=gt_masks is not None,
    )
    gt_masks_14 = None
    if gt_masks is not None:
        # canvas-resolution masks: project on device (host callers that want
        # minimal uplink precompute [G,14,14] and call harvest_chunks)
        gt_masks_14 = jax.vmap(lambda m, b: project_mask_on_box(m, b, 14))(
            gt_masks, gt_boxes
        )
    return harvest_chunks(
        key, t, prop_boxes, prop_valid, feats, deconv, anchors, visibility,
        image_size, gt_boxes, gt_labels, gt_valid, gt_masks_14, hcfg, with_rpn,
    )
