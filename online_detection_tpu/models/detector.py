"""The assembled detector: backbone -> RPN -> ROI heads, as pure functions.

TPU-native equivalent of the reference's inference meta-architecture
(``modeling/detector/generalized_rcnn.py:34-64`` + ``roi_heads.py:22-51``):

    image -> ResNet-50-C4 -> RPN conv -> {pretrained | on-line} head
          -> proposals (top-300) -> RoIAlign(14x14) -> res5 -> avgpool
          -> on-line box predictor -> detection postprocess (top-100)
          -> RoIAlign on detections -> res5 -> conv5_mask deconv
          -> per-pixel FALKON -> 14x14 mask probabilities per detection.

Everything below ``detect`` is one jittable program per static canvas size;
variable image sizes are handled by padding to the canvas (the reference's
ImageList zero-pads to 32-divisible sizes, so conv behavior matches) and
passing the true (width, height) for clipping/anchor-visibility. All outputs
are fixed-size with validity masks.

The on-line models (FalkonModel / RLSModel / stats pytrees) are *arguments*,
not module attributes — the reference's model-injection pattern
(``evaluate_accuracy_detector.py:131-150``) becomes plain function
application.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.models import resnet
from online_detection_tpu.models.heads import (
    OnlineDetectorModels,
    OnlineMaskModels,
    box_predict,
    mask_deconv,
    mask_predict_labels,
)
from online_detection_tpu.models.postprocess import (
    Detections,
    postprocess_detections,
    select_mask_channel,
)
from online_detection_tpu.models.rpn import (
    OnlineRPNModels,
    propose,
    rpn_features,
    rpn_online,
    rpn_pretrained,
)
from online_detection_tpu.ops.roi_align import roi_align


class DetectorConfig(NamedTuple):
    """Static inference configuration (the yacs knobs that matter here;
    values = the shipped experiment configs)."""

    pre_nms_top_n: int = 1000
    post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    score_thresh: float = -2.0
    nms_thresh: float = 0.3
    detections_per_img: int = 100
    pooler_resolution: int = 14
    pooler_scale: float = 1.0 / 16.0
    # RoIAlign lax.map chunk (ops/roi_align.py): None = flat vmap (fastest
    # up to image batch 16 - measured 125 vs 114 imgs/s at b16 flat vs
    # chunk=100); set ~100 for batch >= 32 to bound the separable
    # intermediate (13 GB at batch 32 otherwise -> HBM OOM)
    roi_chunk: Optional[int] = None
    # --normalize_features_regressor_detector (see heads.box_predict)
    normalize_regressor_features: bool = False
    # conv-trunk activation dtype: "float32", "bfloat16", or None = auto
    # (bfloat16 on the TPU backend, float32 elsewhere). The trunk is
    # HBM-bandwidth-bound on v5e (backbone measured at 22 TFLOP/s in f32);
    # bf16 activations halve the traffic while the MXU still accumulates in
    # f32. Head/score/coordinate math stays f32 (z-scoring, RLS, decode,
    # NMS promote at the boundaries). The CPU auto-resolution keeps unit
    # tests and torch-golden parity exact.
    compute_dtype: Optional[str] = None


def resolve_compute_dtype(cfg: DetectorConfig) -> str:
    """None = auto: bfloat16 trunk on TPU, float32 elsewhere (exact tests).

    ``ODTPU_COMPUTE_DTYPE=float32|bfloat16`` overrides the auto-resolution —
    the quality-first escape hatch (the reference runs everything in f32,
    ``mrcnn_modified/config/defaults.py:466``; the bf16 trunk is this
    framework's throughput default on TPU)."""
    import os

    env = os.environ.get("ODTPU_COMPUTE_DTYPE")
    if env:
        return env
    if cfg.compute_dtype is not None:
        return cfg.compute_dtype
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


class OnlineModelSet(NamedTuple):
    """All trained on-line modules. rpn/mask may be None (pretrained RPN /
    detection-only pipelines)."""

    rpn: Optional[OnlineRPNModels]
    detector: OnlineDetectorModels
    mask: Optional[OnlineMaskModels]


def rpn_scores_deltas(params, online_rpn, t):
    """Dispatch pretrained vs on-line RPN head for one image's conv features
    t [H, W, 1024] -> (scores [HW*A], deltas [HW*A, 4])."""
    h, w = t.shape[0], t.shape[1]
    if online_rpn is None:
        logits, deltas = rpn_pretrained(params, t[None])
        a = logits.shape[-1]
        scores = logits[0].reshape(h * w * a)
        deltas = deltas[0].reshape(h * w * a, 4)
    else:
        scores, deltas = rpn_online(online_rpn, t)
        scores = scores.reshape(-1)
        deltas = deltas.reshape(-1, 4)
    return scores, deltas


def extract_box_features(params, c4_img, boxes, cfg: DetectorConfig):
    """RoIAlign + res5 + avgpool -> the 2048-d detector features."""
    pooled = roi_align(
        c4_img, boxes, cfg.pooler_resolution, cfg.pooler_resolution,
        cfg.pooler_scale, roi_chunk=cfg.roi_chunk,
    )
    return resnet.res5_head(params["backbone"], pooled)


def detect(
    params,
    online: OnlineModelSet,
    anchors: jax.Array,  # [HW*A, 4] precomputed for the canvas feature map
    image: jax.Array,  # [H, W, 3] padded canvas, BGR mean-subtracted
    image_size: jax.Array,  # (width, height) true size
    cfg: DetectorConfig = DetectorConfig(),
    with_masks: bool = True,
    gt_boxes: Optional[jax.Array] = None,  # [K, 4] canvas coords
    gt_labels: Optional[jax.Array] = None,  # [K]
    gt_valid: Optional[jax.Array] = None,  # [K] bool
) -> Tuple[Detections, Optional[jax.Array], jax.Array, jax.Array]:
    """Full single-image inference.

    Returns (detections, mask_probs [D,14,14] or None,
             proposals [post_nms,4], proposals_valid).

    When ``gt_boxes`` is given, the detections are REPLACED by the GT boxes
    (labels from GT, score 1) before the mask head — the
    ``--eval_segm_with_gt_bboxes`` mask-quality protocol
    (``roi_heads.py:32-37``).
    """
    from online_detection_tpu.data.transforms import normalize_canvas

    image = normalize_canvas(image).astype(resolve_compute_dtype(cfg))
    c4 = resnet.backbone_c4(params["backbone"], image[None])  # [1,h,w,1024]
    t = rpn_features(params["rpn"], c4)[0]  # [h,w,1024]
    scores, deltas = rpn_scores_deltas(params["rpn"], online.rpn, t)
    prop_boxes, prop_scores, prop_valid = propose(
        scores,
        deltas,
        anchors,
        image_size,
        pre_nms_top_n=cfg.pre_nms_top_n,
        post_nms_top_n=cfg.post_nms_top_n,
        nms_thresh=cfg.rpn_nms_thresh,
        min_size=cfg.rpn_min_size,
    )

    feats = extract_box_features(params, c4[0], prop_boxes, cfg)
    cls_scores, box_deltas = box_predict(
        online.detector, feats, cfg.normalize_regressor_features
    )
    dets = postprocess_detections(
        prop_boxes,
        prop_valid,
        cls_scores,
        box_deltas,
        image_size,
        score_thresh=cfg.score_thresh,
        nms_thresh=cfg.nms_thresh,
        detections_per_img=cfg.detections_per_img,
    )
    if gt_boxes is not None:
        dets = Detections(
            boxes=gt_boxes * gt_valid[:, None],
            scores=gt_valid.astype(jnp.float32),
            labels=gt_labels.astype(jnp.int32) * gt_valid,
            valid=gt_valid,
        )

    mask_probs = None
    if with_masks and online.mask is not None:
        pooled = roi_align(
            c4[0], dets.boxes, cfg.pooler_resolution, cfg.pooler_resolution,
            cfg.pooler_scale, roi_chunk=cfg.roi_chunk,
        )
        res5 = resnet.res5_feature_map(params["backbone"], pooled)  # [D,7,7,2048]
        deconv = mask_deconv(params["mask_head"], res5)  # [D,14,14,256]
        # own-class per-pixel FALKON only (== select_mask_channel over the
        # all-class sweep; see heads.mask_predict_labels)
        mask_probs = mask_predict_labels(online.mask, deconv, dets.labels)

    return dets, mask_probs, prop_boxes, prop_valid


def detect_batched(
    params,
    online: OnlineModelSet,
    anchors: jax.Array,  # [HW*A, 4]
    images: jax.Array,  # [B, H, W, 3] padded canvases
    image_sizes: jax.Array,  # [B, 2] true (width, height)
    cfg: DetectorConfig = DetectorConfig(),
    with_masks: bool = True,
    gt_boxes: Optional[jax.Array] = None,  # [B, K, 4]
    gt_labels: Optional[jax.Array] = None,  # [B, K]
    gt_valid: Optional[jax.Array] = None,  # [B, K] bool
):
    """Image-batched inference, semantically ``jax.vmap(detect)`` (the
    equivalence is unit-tested) but structured for the TPU: per-image stages
    (top-k, NMS, RoIAlign) run under vmap while every rowwise stage — the
    on-line RPN/box/mask head scoring and res5 — runs on the batch
    FLATTENED into the row axis. Measured on v5e at batch 8: XLA's fused
    Gaussian-mmv degrades 2.4x when the feature rows carry a leading batch
    dim (mask head 22.3 -> 9.3 ms/batch flat), so the flattening is worth
    ~2 ms/img of the ~12 ms total."""
    from online_detection_tpu.data.transforms import normalize_canvas
    from online_detection_tpu.models.rpn import rpn_online_flat

    b = images.shape[0]
    images = normalize_canvas(images).astype(resolve_compute_dtype(cfg))
    c4 = resnet.backbone_c4(params["backbone"], images)  # [B,h,w,1024]
    t = rpn_features(params["rpn"], c4)  # [B,h,w,1024]
    h, w, ch = t.shape[1], t.shape[2], t.shape[3]

    if online.rpn is None:
        logits, deltas4 = rpn_pretrained(params["rpn"], t)
        a = logits.shape[-1]
        scores = logits.reshape(b, h * w * a)
        deltas = deltas4.reshape(b, h * w * a, 4)
    else:
        s_f, d_f = rpn_online_flat(online.rpn, t.reshape(b * h * w, ch))
        a = s_f.shape[-1]
        scores = s_f.reshape(b, h * w * a)
        deltas = d_f.reshape(b, h * w * a, 4)

    prop_boxes, prop_scores, prop_valid = jax.vmap(
        lambda s, d, sz: propose(
            s, d, anchors, sz,
            pre_nms_top_n=cfg.pre_nms_top_n,
            post_nms_top_n=cfg.post_nms_top_n,
            nms_thresh=cfg.rpn_nms_thresh,
            min_size=cfg.rpn_min_size,
        )
    )(scores, deltas, image_sizes)  # [B, R, 4], [B, R], [B, R]

    pooled = jax.vmap(
        lambda f, bx: roi_align(
            f, bx, cfg.pooler_resolution, cfg.pooler_resolution,
            cfg.pooler_scale, roi_chunk=cfg.roi_chunk,
        )
    )(c4, prop_boxes)  # [B, R, P, P, 1024]
    r = pooled.shape[1]
    feats = resnet.res5_head(
        params["backbone"], pooled.reshape((b * r,) + pooled.shape[2:])
    )  # [B*R, 2048]
    cls_scores, box_deltas = box_predict(
        online.detector, feats, cfg.normalize_regressor_features
    )
    dets = jax.vmap(
        lambda pb, pv, cs, bd, sz: postprocess_detections(
            pb, pv, cs, bd, sz,
            score_thresh=cfg.score_thresh,
            nms_thresh=cfg.nms_thresh,
            detections_per_img=cfg.detections_per_img,
        )
    )(
        prop_boxes, prop_valid,
        cls_scores.reshape(b, r, -1), box_deltas.reshape(b, r, -1),
        image_sizes,
    )
    if gt_boxes is not None:
        dets = Detections(
            boxes=gt_boxes * gt_valid[..., None],
            scores=gt_valid.astype(jnp.float32),
            labels=gt_labels.astype(jnp.int32) * gt_valid,
            valid=gt_valid,
        )

    mask_probs = None
    if with_masks and online.mask is not None:
        pooled2 = jax.vmap(
            lambda f, bx: roi_align(
                f, bx, cfg.pooler_resolution, cfg.pooler_resolution,
                cfg.pooler_scale, roi_chunk=cfg.roi_chunk,
            )
        )(c4, dets.boxes)  # [B, D, P, P, 1024]
        d = pooled2.shape[1]
        res5 = resnet.res5_feature_map(
            params["backbone"], pooled2.reshape((b * d,) + pooled2.shape[2:])
        )  # [B*D, 7, 7, 2048]
        deconv = mask_deconv(params["mask_head"], res5)
        mask_probs = mask_predict_labels(
            online.mask, deconv, dets.labels.reshape(b * d)
        ).reshape(b, d, cfg.pooler_resolution, cfg.pooler_resolution)

    return dets, mask_probs, prop_boxes, prop_valid


def detect_pretrained(
    params,
    anchors: jax.Array,
    image: jax.Array,
    image_size: jax.Array,
    cfg: DetectorConfig = DetectorConfig(),
    with_masks: bool = False,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
):
    """Stock Mask R-CNN inference (softmax path) for the SGD baselines and
    checkpoint evaluation (``engine/inference_full_mask.py``,
    ``box_head/inference.py:12-147``): pretrained RPN proposals -> res5 ->
    linear cls/bbox predictors -> softmax scores, (10,10,5,5) decode,
    per-class NMS."""
    from online_detection_tpu.data.transforms import normalize_canvas

    image = normalize_canvas(image).astype(resolve_compute_dtype(cfg))
    c4 = resnet.backbone_c4(params["backbone"], image[None])
    t = rpn_features(params["rpn"], c4)[0]
    scores, deltas = rpn_scores_deltas(params["rpn"], None, t)
    prop_boxes, _, prop_valid = propose(
        scores, deltas, anchors, image_size,
        pre_nms_top_n=cfg.pre_nms_top_n, post_nms_top_n=cfg.post_nms_top_n,
        nms_thresh=cfg.rpn_nms_thresh, min_size=cfg.rpn_min_size,
    )
    feats = extract_box_features(params, c4[0], prop_boxes, cfg)
    bp = params["box_predictor"]
    cls_logits = feats @ bp["cls_w"] + bp["cls_b"]
    box_deltas = feats @ bp["bbox_w"] + bp["bbox_b"]
    probs = jax.nn.softmax(cls_logits, axis=-1)

    from online_detection_tpu.utils import boxes as box_ops

    refined = box_ops.decode_boxes(
        box_deltas, prop_boxes, weights=(10.0, 10.0, 5.0, 5.0), clip_exp=True
    )
    refined = box_ops.clip_boxes_to_image(refined, image_size)
    r = probs.shape[0]
    per_class_boxes = refined.reshape(r, -1, 4).transpose(1, 0, 2)
    per_class_scores = probs.T
    keep = (per_class_scores > score_thresh) & prop_valid[None, :]
    keep = keep.at[0].set(False)
    from online_detection_tpu.ops.nms import batched_class_nms

    b, s, v, _ = batched_class_nms(
        per_class_boxes, per_class_scores, keep, nms_thresh, cfg.detections_per_img
    )
    flat_scores = jnp.where(v, s, -1e30).reshape(-1)
    flat_boxes = b.reshape(-1, 4)
    labels = jnp.broadcast_to(
        jnp.arange(probs.shape[1], dtype=jnp.int32)[:, None],
        (probs.shape[1], cfg.detections_per_img),
    ).reshape(-1)
    top_scores, idx = jax.lax.top_k(flat_scores, cfg.detections_per_img)
    out_valid = top_scores > -1e29
    dets = Detections(
        boxes=flat_boxes[idx] * out_valid[:, None],
        scores=jnp.where(out_valid, top_scores, 0.0),
        labels=jnp.where(out_valid, labels[idx], 0),
        valid=out_valid,
    )

    mask_probs = None
    if with_masks and params.get("mask_head"):
        from online_detection_tpu.models.heads import (
            mask_deconv,
            mask_pretrained_logits,
        )

        pooled = roi_align(
            c4[0], dets.boxes, cfg.pooler_resolution, cfg.pooler_resolution,
            cfg.pooler_scale, roi_chunk=cfg.roi_chunk,
        )
        res5 = resnet.res5_feature_map(params["backbone"], pooled)
        deconv = mask_deconv(params["mask_head"], res5)
        logits = mask_pretrained_logits(params["mask_head"], deconv)
        mask_probs = select_mask_channel(logits, dets.labels)
    return dets, mask_probs, prop_boxes, prop_valid


def detect_jit(canvas_hw: Tuple[int, int], cfg: DetectorConfig, with_masks: bool):
    """Build a jitted single-image inference function for a fixed canvas."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(params, online, anchors, image, image_size):
        return detect(params, online, anchors, image, image_size, cfg, with_masks)

    return fn


def init_detector_params(key: jax.Array, num_anchors: int = 15, num_classes: int = 22):
    """Random-weight parameter tree with the full schema (backbone + RPN +
    mask head) — the unit-test stand-in for converted Caffe2 weights."""
    from online_detection_tpu.models.heads import init_mask_head_params
    from online_detection_tpu.models.rpn import init_rpn_params

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "backbone": resnet.init_resnet50_params(k1),
        "rpn": init_rpn_params(k2, 1024, num_anchors),
        "mask_head": init_mask_head_params(k3, 2048, 256, num_classes),
    }
