"""On-line ROI heads: box predictor, mask predictor — pure functions.

Rebuilds:

- ``OnlineDetectionBOXPredictor`` (``roi_box_predictors.py:8-160``): 2048-d
  avg-pooled res5 features -> per-class FALKON scores (background column
  fixed at -2) + per-class RLS box deltas (background deltas = 0). The
  reference's packed-alpha/block-diagonal "parallel" paths are replaced by
  the class-batched FALKON/RLS predicts. The regressors consume RAW features
  by default and z-scored features only when the experiment passes
  ``--normalize_features_regressor_detector``
  (``roi_box_predictors.py:37-60``, ``run_experiment_online_rpn_ood_oos.py:130-160``);
  classifier features are always z-scored.
- ``MaskRCNNC4Predictor`` (``roi_mask_predictors.py:17-99``): res5 RoI
  features -> 2x2-stride-2 deconv to 256ch@14x14 -> ReLU -> per-pixel
  z-score -> per-class per-pixel FALKON -> [R, 14, 14, C+1] logits
  (background -2).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from online_detection_tpu.solvers.falkon import FalkonModel, falkon_predict_classes
from online_detection_tpu.solvers.rls import RLSModel, rls_predict
from online_detection_tpu.utils.stats import FeatureStats, zscore

BACKGROUND_SCORE = -2.0


class OnlineDetectorModels(NamedTuple):
    """Per-class detection head state (class axis = C target classes)."""

    falkon: FalkonModel
    rls: RLSModel
    stats: FeatureStats


class OnlineMaskModels(NamedTuple):
    """Per-class per-pixel segmentation head state."""

    falkon: FalkonModel  # [C, M, 256]
    stats: FeatureStats


def box_predict(
    models: OnlineDetectorModels,
    feats: jax.Array,
    normalize_regressor_features: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """feats [R, 2048] -> (scores [R, C+1], deltas [R, (C+1)*4]).

    Column 0 is background: score -2, deltas 0
    (``roi_box_predictors.py:79-99,131-145``). The flag mirrors
    ``--normalize_features_regressor_detector`` and must be static.
    """
    r = feats.shape[0]
    z = zscore(feats, models.stats)
    reg_in = z if normalize_regressor_features else feats
    cls = falkon_predict_classes(models.falkon, z, missing_score=BACKGROUND_SCORE)
    deltas = rls_predict(models.rls, reg_in)  # [R, C, 4]
    scores = jnp.concatenate(
        [jnp.full((r, 1), BACKGROUND_SCORE, cls.dtype), cls], axis=1
    )
    deltas = jnp.concatenate(
        [jnp.zeros((r, 1, 4), deltas.dtype), deltas], axis=1
    ).reshape(r, -1)
    return scores, deltas


def mask_deconv(params, x: jax.Array) -> jax.Array:
    """conv5_mask: ConvTranspose2d(2048 -> 256, k=2, s=2) + ReLU.
    x [R, 7, 7, 2048] -> [R, 14, 14, 256].

    With kernel 2 / stride 2 the transpose conv has no overlap, so it is
    exactly ``out[n, 2h+a, 2w+b, o] = sum_i x[n,h,w,i] * w[a,b,i,o]`` — one
    einsum straight onto the MXU (and bit-identical to torch's
    ConvTranspose2d placement semantics, unlike lax.conv_transpose's
    unflipped kernel)."""
    w = params["w"]  # [2, 2, in, out]
    n, h, wd, _ = x.shape
    out = jnp.einsum(
        "nhwi,abio->nhawbo",
        x,
        w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(n, 2 * h, 2 * wd, w.shape[-1])
    return jax.nn.relu(out + params["b"])


def mask_pretrained_logits(params, x: jax.Array) -> jax.Array:
    """Stock path: 1x1 conv 256 -> C+1 (``mask_fcn_logits``)."""
    return (
        jnp.einsum("rhwc,ck->rhwk", x, params["logits_w"],
                   preferred_element_type=jnp.float32)
        + params["logits_b"]
    )


def mask_predict(
    models: OnlineMaskModels, deconv_feats: jax.Array
) -> jax.Array:
    """deconv_feats [R, 14, 14, 256] -> per-pixel class scores
    [R, 14, 14, C+1] (background -2), matching ``roi_mask_predictors.py:37-99``.
    """
    r, h, w, ch = deconv_feats.shape
    flat = zscore(deconv_feats.reshape(-1, ch), models.stats)
    cls = falkon_predict_classes(models.falkon, flat, missing_score=BACKGROUND_SCORE)
    cls = cls.reshape(r, h, w, -1)
    bg = jnp.full((r, h, w, 1), BACKGROUND_SCORE, cls.dtype)
    return jnp.concatenate([bg, cls], axis=-1)


def mask_predict_labels(
    models: OnlineMaskModels,
    deconv_feats: jax.Array,  # [R, 14, 14, 256]
    labels: jax.Array,  # [R] predicted labels (0 = background)
    roi_chunk: int = 256,
) -> jax.Array:
    """[R, 14, 14] sigmoid mask probabilities of each RoI's OWN class.

    Algebraically ``select_mask_channel(mask_predict(feats), labels)``
    (equivalence unit-tested), but evaluates only the selected per-pixel
    FALKON classifier per RoI. The fused all-class sweep — which the
    reference also does (``roi_mask_predictors.py:72-99`` packs every
    class's Nystrom centers into one mmv, then ``MaskPostProcessor`` keeps
    one channel per box) — computes C*M kernel columns per pixel and
    discards all but M of them: at the flagship 21 classes that is 21x the
    kernel FLOPs and 21x the exp()s (the VPU cost dominates: 1.6e9 exps per
    batch-8 vs 7.8e7 here). Measured on v5e: mask tail 1.8 -> ~0.4 ms/img.

    ``roi_chunk`` bounds the gathered per-RoI center blocks
    ([chunk, M, 256]) so HBM stays flat at any detection count.
    """
    r, h, w, ch = deconv_feats.shape
    m = models.falkon.centers.shape[1]
    sigma = models.falkon.sigma
    flat = zscore(deconv_feats.reshape(r, h * w, ch), models.stats)
    cls_idx = jnp.clip(labels.astype(jnp.int32) - 1, 0, None)  # [R]

    def score_chunk(args):
        f, idx = args  # [c, P, ch], [c]
        from online_detection_tpu.ops.gaussian_mmv import kernel_precision

        hp = kernel_precision()  # see there: the TPU bf16-pass default
        # corrupts the cancelled distance cross term and the K@alpha sum
        centers = models.falkon.centers[idx]  # [c, M, ch]
        alpha = models.falkon.alpha[idx]  # [c, M]
        sq = (
            jnp.sum(f * f, axis=-1)[:, :, None]
            + jnp.sum(centers * centers, axis=-1)[:, None, :]
            - 2.0 * jnp.einsum("cpk,cmk->cpm", f, centers,
                               preferred_element_type=jnp.float32,
                               precision=hp)
        )
        k = jnp.exp(-jnp.maximum(sq, 0.0) / (2.0 * sigma * sigma))
        return jnp.einsum("cpm,cm->cp", k, alpha,
                          preferred_element_type=jnp.float32, precision=hp)

    if r <= roi_chunk:
        scores = score_chunk((flat, cls_idx))  # [R, P]
    else:
        pad = (-r) % roi_chunk
        fp = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
        ip = jnp.pad(cls_idx, (0, pad))
        n_chunks = (r + pad) // roi_chunk
        scores = jax.lax.map(
            score_chunk,
            (fp.reshape(n_chunks, roi_chunk, h * w, ch),
             ip.reshape(n_chunks, roi_chunk)),
        ).reshape(n_chunks * roi_chunk, h * w)[:r]

    selected_exists = models.falkon.exists[cls_idx] & (labels > 0)
    scores = jnp.where(selected_exists[:, None], scores, BACKGROUND_SCORE)
    return jax.nn.sigmoid(scores).reshape(r, h, w)


def init_mask_head_params(key: jax.Array, in_ch: int = 2048, mid: int = 256, num_classes: int = 22):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (2, 2, in_ch, mid)) * (2.0 / (4 * in_ch)) ** 0.5,
        "b": jnp.zeros((mid,)),
        "logits_w": jax.random.normal(k2, (mid, num_classes)) * 0.01,
        "logits_b": jnp.zeros((num_classes,)),
    }
