"""RoIAlign as separable bilinear matmuls — the TPU-native formulation.

Replaces maskrcnn-benchmark's CUDA ``roi_align`` (SURVEY.md §2.3), used by the
C4 box-head pooler (``roi_box_feature_extractors.py:21-25,46-52``) and the
mask pooler. Semantics follow the legacy Detectron ROIAlign (no half-pixel
alignment):

- ``roi_start = coord * spatial_scale`` (no -0.5 shift, no rounding),
- ``roi_size = max(end - start, 1)``,
- ``sampling_ratio == 0`` -> adaptive ``ceil(roi_size / pooled)`` samples per
  bin per axis, each sample bilinearly interpolated and averaged,
- out-of-range samples (coord < -1 or > size) contribute 0; coords in (-1, 0]
  clamp to 0; the top edge clamps to the last row/col.

TPU design: bilinear interpolation is **separable**, so each RoI's pooled
output is ``A @ F @ B^T`` with per-RoI interpolation matrices
``A: [ph, H]`` and ``B: [pw, W]`` that fold the (masked, adaptive) sample
averaging into their entries. Gathers become two small matmuls per RoI that
XLA batches onto the MXU — no [R*P*P, H*W] one-hot blow-up and no
scalar-gather HBM storm. The adaptive sample count is handled with a static
``max_samples`` bound and masking, keeping every shape static under jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _interp_matrix(
    start: jax.Array,  # scalar roi start (feature coords)
    size: jax.Array,  # scalar roi size (>= 1)
    pooled: int,
    dim: int,
    max_samples: int,
) -> jax.Array:
    """Build the [pooled, dim] averaged-bilinear interpolation matrix for one
    axis of one RoI. Adaptive sampling: n = ceil(size / pooled) clamped to
    [1, max_samples]; samples beyond n are masked out of the average."""
    bin_size = size / pooled
    n_f = jnp.ceil(bin_size)
    n = jnp.clip(n_f, 1, max_samples)  # float

    ph = jnp.arange(pooled, dtype=jnp.float32)[:, None]  # [P, 1]
    s = jnp.arange(max_samples, dtype=jnp.float32)[None, :]  # [1, S]
    sample_mask = s < n  # [1, S] broadcasting over P
    # sample coordinate: start + (ph + (s + .5)/n) * bin_size
    coord = start + (ph + (s + 0.5) / n) * bin_size  # [P, S]

    # legacy detectron bilinear clamping
    in_range = (coord >= -1.0) & (coord <= dim)
    c = jnp.clip(coord, 0.0, dim - 1.0)
    low = jnp.floor(c)
    frac = c - low

    grid = jnp.arange(dim, dtype=jnp.float32)[None, None, :]  # [1, 1, D]
    w_low = (grid == low[..., None]) * (1.0 - frac[..., None])
    w_high = (grid == (low[..., None] + 1.0)) * frac[..., None]
    # when low == dim-1, high is out of grid and frac == 0 (c clamped), so
    # w_high vanishes and w_low carries weight 1 — matching y_high=y_low=dim-1.
    w = (w_low + w_high) * (in_range & sample_mask)[..., None]  # [P, S, D]
    return jnp.sum(w, axis=1) / n  # [P, D]


@functools.partial(
    jax.jit,
    static_argnames=("pooled_h", "pooled_w", "spatial_scale", "max_samples",
                     "roi_chunk"),
)
def roi_align(
    features: jax.Array,  # [H, W, C] channel-last
    rois: jax.Array,  # [R, 4] xyxy in image coordinates
    pooled_h: int = 14,
    pooled_w: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    max_samples: int = 8,
    roi_chunk=None,
) -> jax.Array:
    """RoIAlign: -> [R, pooled_h, pooled_w, C].

    ``max_samples`` is the static bound for the adaptive sampling grid; 8
    covers RoIs up to ``8 * pooled`` feature cells (= 1792 input px at
    stride 16 with pooled 14), beyond the reference's max image side 1333.

    ``roi_chunk``: when set, the RoI axis is processed in lax.map chunks of
    this size. The flat vmap (None, default — fastest at small image batch)
    materializes the [R, P, W, C] separable intermediate: 400 MB per image at
    300 RoIs x 600px canvas, 13 GB at canvas batch 32, which OOMs the v5e.
    Chunking bounds it at [B, chunk, P, W, C] while each chunk stays one
    large MXU matmul; large-batch callers set it via DetectorConfig.roi_chunk
    (costs ~10% at batch 8, enables batch >= 16).
    """
    h, w = features.shape[0], features.shape[1]

    def one_roi(roi):
        x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
        start_w = x1 * spatial_scale
        start_h = y1 * spatial_scale
        size_w = jnp.maximum(x2 * spatial_scale - start_w, 1.0)
        size_h = jnp.maximum(y2 * spatial_scale - start_h, 1.0)
        a = _interp_matrix(start_h, size_h, pooled_h, h, max_samples)  # [P,H]
        b = _interp_matrix(start_w, size_w, pooled_w, w, max_samples)  # [P,W]
        # A @ F @ B^T over channels, contracting the LONGER spatial axis
        # first so the per-RoI intermediate ([P,W,C] vs [H,P,C]) — the op's
        # HBM cost — is minimal (24% smaller at the 38x50 600px feature map).
        # Dtype-following (coordinate/weight math stays f32): bf16 features
        # halve the intermediate again.
        dt = features.dtype
        if w >= h:  # contract w first -> [H, P, C], then h
            t = jnp.einsum("qw,hwc->hqc", b.astype(dt), features,
                           preferred_element_type=dt)
            return jnp.einsum("ph,hqc->pqc", a.astype(dt), t,
                              preferred_element_type=dt)
        t = jnp.einsum("ph,hwc->pwc", a.astype(dt), features,
                       preferred_element_type=dt)
        return jnp.einsum("qw,pwc->pqc", b.astype(dt), t,
                          preferred_element_type=dt)

    rois = rois.astype(jnp.float32)
    r = rois.shape[0]
    if roi_chunk is None or r <= roi_chunk:
        return jax.vmap(one_roi)(rois)
    n_chunks = -(-r // roi_chunk)
    pad = n_chunks * roi_chunk - r
    rois_p = jnp.pad(rois, ((0, pad), (0, 0))).reshape(n_chunks, roi_chunk, 4)
    out = jax.lax.map(jax.vmap(one_roi), rois_p)
    return out.reshape(n_chunks * roi_chunk, pooled_h, pooled_w, -1)[:r]


def roi_align_nchw(
    features: jax.Array,  # [C, H, W]
    rois: jax.Array,
    **kw,
) -> jax.Array:
    """Convenience wrapper matching the reference's NCHW layout -> [R,C,P,P]."""
    out = roi_align(jnp.transpose(features, (1, 2, 0)), rois, **kw)
    return jnp.transpose(out, (0, 3, 1, 2))
