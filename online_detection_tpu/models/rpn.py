"""RPN: pretrained conv head, on-line FALKON head, and the proposal stage.

Rebuilds the reference's ``modeling/rpn/rpn.py`` (OnlineRPNHead) and
``modeling/rpn/inference.py`` (RPNPostProcessor) as pure functions:

- ``rpn_features``     : shared 3x3 conv + ReLU on C4 (``rpn.py:87-89,110``).
- ``rpn_pretrained``   : 1x1 cls-logit / 4A-channel bbox conv (``rpn.py:90-97``)
                         — used to propose boxes during feature harvesting
                         (``propagate_rpn_boxes``) and by the baselines.
- ``rpn_online``       : per-anchor-shape FALKON objectness + RLS refinement
                         on z-scored 1024-d conv features (``rpn.py:106-135``).
                         The class-batched FALKON/RLS predict IS the fused
                         parallel path (``rpn.py:158-227``) — one batched mmv
                         for all 15 anchor classifiers.
- ``propose``          : sigmoid -> top-k(pre_nms=1000) -> decode(w=1, clipped
                         exp) -> clip -> NMS 0.7 -> top(post_nms=300), with
                         fixed-size padded outputs (``rpn/inference.py:76-152``,
                         config PRE/POST_NMS 1000/300).

Static-shape contract: one (H, W) feature-map size per compiled program; the
image canvas is padded to a fixed size upstream (the reference's ImageList
pads to 32-divisible sizes too, so padded-conv behavior matches).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.ops.nms import nms
from online_detection_tpu.solvers.falkon import FalkonModel, falkon_predict_classes
from online_detection_tpu.solvers.rls import RLSModel, rls_predict
from online_detection_tpu.utils import boxes as box_ops
from online_detection_tpu.utils.stats import FeatureStats, zscore


class OnlineRPNModels(NamedTuple):
    """The on-line RPN head state: 15 per-anchor-shape FALKON classifiers,
    15 RLS refiners, and the feature statistics used for z-scoring."""

    falkon: FalkonModel  # class axis = anchor shape (A=15)
    rls: RLSModel
    stats: FeatureStats


def rpn_features(params, c4: jax.Array) -> jax.Array:
    """Shared RPN conv: 3x3 + ReLU, 1024 -> 1024. c4: [N, H, W, 1024].
    Dtype-following like resnet.conv (bf16 in -> bf16 activations out)."""
    out = jax.lax.conv_general_dilated(
        c4,
        params["conv_w"].astype(c4.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=c4.dtype,
    )
    return jax.nn.relu(out + params["conv_b"].astype(c4.dtype))


def rpn_pretrained(params, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Pretrained 1x1 heads: t [N,H,W,1024] -> logits [N,H,W,A],
    deltas [N,H,W,4A] (delta layout per anchor: (dx,dy,dw,dh))."""
    logits = (
        jnp.einsum("nhwc,ca->nhwa", t, params["cls_w"],
                   preferred_element_type=jnp.float32)
        + params["cls_b"]
    )
    deltas = (
        jnp.einsum("nhwc,ck->nhwk", t, params["bbox_w"],
                   preferred_element_type=jnp.float32)
        + params["bbox_b"]
    )
    return logits, deltas


def rpn_online_flat(
    models: OnlineRPNModels, flat: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """On-line head on flat conv-feature rows [N, 1024] -> (scores [N, A],
    deltas [N, A, 4]). Rowwise, so callers may flatten an image batch into N
    (detect_batched does: the head mmvs fuse ~25% faster without a leading
    batch dim)."""
    flat = zscore(flat, models.stats)
    scores = falkon_predict_classes(models.falkon, flat)  # [N, A]
    deltas = rls_predict(models.rls, flat)  # [N, A, 4]
    return scores, deltas


def rpn_online(
    models: OnlineRPNModels, t: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """On-line head on one image's conv features t [H, W, 1024].

    Returns (scores [H*W, A], deltas [H*W, A, 4]).
    Features are z-scored once and shared by classifiers AND refiners
    (``rpn.py:120-127`` — the RPN path, unlike the detector default,
    normalizes before regression too).
    """
    h, w, ch = t.shape
    return rpn_online_flat(models, t.reshape(h * w, ch))


@functools.partial(
    jax.jit,
    static_argnames=("pre_nms_top_n", "post_nms_top_n", "nms_thresh", "min_size"),
)
def propose(
    scores: jax.Array,  # [HW*A] raw objectness (pre-sigmoid)
    deltas: jax.Array,  # [HW*A, 4]
    anchors: jax.Array,  # [HW*A, 4]
    image_size: Tuple[int, int] | jax.Array,  # (width, height) true size
    pre_nms_top_n: int = 1000,
    post_nms_top_n: int = 300,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
):
    """RPN proposal stage -> (boxes [post,4], objectness [post], valid [post]).

    Objectness is passed through sigmoid (``rpn/inference.py:90``) — monotone,
    so top-k runs on raw scores and sigmoid is applied to the kept ones.
    """
    k = min(pre_nms_top_n, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_deltas = deltas[idx]
    top_anchors = anchors[idx]
    boxes = box_ops.decode_boxes(top_deltas, top_anchors, clip_exp=True)
    boxes = box_ops.clip_boxes_to_image(boxes, image_size)
    valid = box_ops.remove_small_boxes_mask(boxes, min_size)
    out_boxes, out_scores, out_valid, _ = nms(
        boxes, top_scores, valid, nms_thresh, post_nms_top_n
    )
    return out_boxes, jax.nn.sigmoid(out_scores), out_valid


def init_rpn_params(key: jax.Array, channels: int = 1024, num_anchors: int = 15):
    """Random init with the exact parameter schema the Caffe2/torch converter
    fills (conv + cls_logits + bbox_pred, ``rpn.py:87-97``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv_w": jax.random.normal(k1, (3, 3, channels, channels)) * 0.01,
        "conv_b": jnp.zeros((channels,)),
        "cls_w": jax.random.normal(k2, (channels, num_anchors)) * 0.01,
        "cls_b": jnp.zeros((num_anchors,)),
        "bbox_w": jax.random.normal(k3, (channels, num_anchors * 4)) * 0.01,
        "bbox_b": jnp.zeros((num_anchors * 4,)),
    }
