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


def _interp_matrices(rois, pooled_h, pooled_w, h, w, spatial_scale,
                     max_samples):
    """Per-RoI separable interpolation matrices A [R, P, H], B [R, P, W]."""

    def one(roi):
        x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
        start_w = x1 * spatial_scale
        start_h = y1 * spatial_scale
        size_w = jnp.maximum(x2 * spatial_scale - start_w, 1.0)
        size_h = jnp.maximum(y2 * spatial_scale - start_h, 1.0)
        a = _interp_matrix(start_h, size_h, pooled_h, h, max_samples)
        b = _interp_matrix(start_w, size_w, pooled_w, w, max_samples)
        return a, b

    return jax.vmap(one)(rois.astype(jnp.float32))


def _fused_pool_kernel(a_ref, b_ref, f_ref, out_ref):
    """One (batch, channel-tile, roi-tile) program: pooled = A @ F @ B^T with
    the [rt, H, P, C] intermediate held in VMEM registers — the separable
    XLA path materializes it in HBM (two dot HLOs can't fuse), which makes
    RoIAlign HBM-bound (~780 MB/batch-8 at 300 RoIs; measured at the v5e
    bandwidth ceiling)."""
    a = a_ref[0]  # [rt, P, H] f32
    b = b_ref[0]  # [rt, P, W] f32
    f = f_ref[0]  # [H, W, ct]
    dt = f.dtype
    # contract W: [rt, P, W] x [H, W, ct] -> [rt, P, H, ct]
    t = jax.lax.dot_general(
        b.astype(dt), f,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # contract H (batched over rt): [rt, P, H] x [rt, P, H, ct] -> [rt, P, P, ct]
    out = jax.lax.dot_general(
        a, t.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [rt, Pa, Pb, ct] (lhs free Pa, rhs free Pb)
    out_ref[0] = out.astype(out_ref.dtype)


def roi_align_batched(
    features: jax.Array,  # [B, H, W, C]
    rois: jax.Array,  # [B, R, 4]
    pooled_h: int = 14,
    pooled_w: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    max_samples: int = 8,
    roi_tile: int = 16,
    chan_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Batched RoIAlign -> [B, R, P, P, C] via a fused Pallas kernel —
    kept as the measured-and-documented EXPLICIT-FUSION VARIANT; the
    separable XLA path remains the production default.

    Exact same averaged-bilinear semantics as ``roi_align`` (the A/B
    matrices are shared code; kernel-vs-separable equivalence is
    unit-tested in interpret mode, and measured bit-exact on v5e). Grid
    order (b, c, r) keeps the feature block constant along the inner axis
    so F is DMA'd once per channel tile, eliminating the [R, H, P, C]
    HBM intermediate. Measured at the production shape ([8, 38, 50, 1024],
    300 RoIs, bf16) it is nonetheless SLOWER than the separable path
    (26.8 vs 16.0 ms standalone): the per-RoI second contraction is a
    batch of M=14 matmuls that Mosaic lowers at ~3% MXU utilization,
    which costs more than the HBM traffic it saves. Same verdict as the
    hand Pallas Gaussian-mmv (ops/gaussian_mmv.py): XLA's fusion wins at
    these shapes; the kernel stays for odd shapes and as the explicit
    traffic-model baseline. Non-TPU backends without ``interpret`` fall
    back to the separable path.
    """
    bb, h, w, c = features.shape
    r = rois.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return jax.vmap(
            lambda f, bx: roi_align(f, bx, pooled_h, pooled_w, spatial_scale,
                                    max_samples)
        )(features, rois)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_mats, b_mats = jax.vmap(
        lambda rr: _interp_matrices(rr, pooled_h, pooled_w, h, w,
                                    spatial_scale, max_samples)
    )(rois)  # [B, R, P, H], [B, R, P, W]

    r_pad = (-r) % roi_tile
    if r_pad:
        a_mats = jnp.pad(a_mats, ((0, 0), (0, r_pad), (0, 0), (0, 0)))
        b_mats = jnp.pad(b_mats, ((0, 0), (0, r_pad), (0, 0), (0, 0)))
    rp = r + r_pad
    ct = min(chan_tile, c)
    assert c % ct == 0, "channel count must tile"
    grid = (bb, c // ct, rp // roi_tile)

    out = pl.pallas_call(
        _fused_pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, roi_tile, pooled_h, h),
                         lambda b_, c_, r_: (b_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, roi_tile, pooled_w, w),
                         lambda b_, c_, r_: (b_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, ct), lambda b_, c_, r_: (b_, 0, 0, c_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, roi_tile, pooled_h, pooled_w, ct),
            lambda b_, c_, r_: (b_, r_, 0, 0, c_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bb, rp, pooled_h, pooled_w, c), features.dtype
        ),
        interpret=interpret,
    )(a_mats, b_mats, features)
    return out[:, :r]


def roi_align_nchw(
    features: jax.Array,  # [C, H, W]
    rois: jax.Array,
    **kw,
) -> jax.Array:
    """Convenience wrapper matching the reference's NCHW layout -> [R,C,P,P]."""
    out = roi_align(jnp.transpose(features, (1, 2, 0)), rois, **kw)
    return jnp.transpose(out, (0, 3, 1, 2))


def _fused2_kernel(a_ref, bd_ref, f_ref, out_ref, *, rt, ph, pw, h, w):
    """One (batch, chan-tile, roi-tile) program of :func:`roi_align_fused2`.

    Stage 1 — shared-F contraction, ONE big matmul: ``A2 [rt*ph, H] @
    F2 [H, W*ct]``. Every RoI's H-contraction shares the feature tile, so
    M = rt*ph (224 at rt=16) drives the MXU instead of per-RoI M=14.

    Stage 2 — the per-RoI W-contraction as ONE block-diagonal matmul:
    ``BD [rt*pw, rt*W] @ T1' [rt*W, ph*ct]`` where block r of BD is B[r].
    This spends rt x the useful FLOPs (the zero cross-RoI blocks) to turn a
    batch of M=14 matmuls — which Mosaic lowers at ~3% MXU utilization and
    which made the round-2 fused kernel LOSE to the separable XLA path —
    into one MXU-shaped product. At rt=16, W=50: 16x FLOPs at >50% util
    beats 1x at 3%, and the [R, ph, W, C] intermediate that makes the
    separable path HBM-bound never leaves VMEM.
    """
    a2 = a_ref[0, 0]  # [rt*ph, H] f32
    bd = bd_ref[0, 0]  # [rt*pw, rt*W] f32 (block-diagonal)
    f = f_ref[0]  # [H, W, ct]
    ct = f.shape[-1]
    dt = f.dtype
    # stage 1: [rt*ph, H] @ [H, W*ct] -> [rt*ph, W*ct]
    t1 = jax.lax.dot_general(
        a2.astype(dt), f.reshape(h, w * ct),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # regroup rows by (r, w): [rt, ph, W, ct] -> [rt*W, ph*ct]
    t1p = (
        t1.reshape(rt, ph, w, ct)
        .transpose(0, 2, 1, 3)
        .reshape(rt * w, ph * ct)
    )
    # stage 2: [rt*pw, rt*W] @ [rt*W, ph*ct] -> [rt*pw, ph*ct]
    out = jax.lax.dot_general(
        bd.astype(dt), t1p.astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # rows are (r, q); cols (p, c) -> [rt, ph, pw, ct]
    out_ref[0] = (
        out.reshape(rt, pw, ph, ct).transpose(0, 2, 1, 3)
    ).astype(out_ref.dtype)


def roi_align_fused2(
    features: jax.Array,  # [B, H, W, C]
    rois: jax.Array,  # [B, R, 4]
    pooled_h: int = 14,
    pooled_w: int = 14,
    spatial_scale: float = 1.0 / 16.0,
    max_samples: int = 8,
    roi_tile: int = 16,
    chan_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Batched RoIAlign -> [B, R, P, P, C]: second-generation fused Pallas
    kernel (see :func:`_fused2_kernel` for the two-matmul shape story).
    Exact same averaged-bilinear semantics as :func:`roi_align` — the A/B
    interpolation matrices are the shared code path; equivalence is
    unit-tested in interpret mode (and measured bf16-exact on v5e).

    MEASURED VERDICT (round 5, v5e, [8, 38, 50, 1024] bf16, 300 RoIs): the
    block-diagonal stage 2 does NOT recover the round-2 kernel's loss —
    27.6 ms (rt=16) / 27.1 (rt=8) vs 26.8 for the v1 kernel and **16.0 for
    the separable XLA path** (rt=32 exceeds the 16 MB VMEM scoped limit).
    Per-program accounting: the two MXU dots cost ~4.5 us at peak but each
    program measures ~23 us — the inter-stage VMEM regroup
    ([rt, ph, W, ct] -> [rt*W, ph*ct], ph=14 misaligned to the (8, 128)
    tiling) lowers to sublane shuffles that dominate. Third data point for
    the same lesson as ops/gaussian_mmv.py: at these shapes XLA's fusion +
    layout machinery beats hand kernels; the separable path stays the
    production default, and this kernel stays as the documented exploration
    of the roofline gap (BASELINE.md names RoIAlign's +0.13 ms/img over its
    HBM floor — closing it needs a layout where the regroup is free, which
    the separable algebra does not admit). Non-TPU backends without
    ``interpret`` fall back to the separable path."""
    bb, h, w, c = features.shape
    r = rois.shape[1]
    if not interpret and jax.default_backend() != "tpu":
        return jax.vmap(
            lambda f, bx: roi_align(f, bx, pooled_h, pooled_w, spatial_scale,
                                    max_samples)
        )(features, rois)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_mats, b_mats = jax.vmap(
        lambda rr: _interp_matrices(rr, pooled_h, pooled_w, h, w,
                                    spatial_scale, max_samples)
    )(rois)  # [B, R, P, H], [B, R, P, W]

    rt = roi_tile
    r_pad = (-r) % rt
    if r_pad:
        a_mats = jnp.pad(a_mats, ((0, 0), (0, r_pad), (0, 0), (0, 0)))
        b_mats = jnp.pad(b_mats, ((0, 0), (0, r_pad), (0, 0), (0, 0)))
    rp = r + r_pad
    n_rt = rp // rt

    # host-side (XLA) prep: flatten A to [B, n_rt, rt*ph, H]; build the
    # block-diagonal B [B, n_rt, rt*pw, rt*W] (tiny: f32 224x800 per tile)
    a2 = a_mats.reshape(bb, n_rt, rt * pooled_h, h)
    # [B, n_rt, rt, pw, rt', W]: block r==r' carries B[r], rest zero
    bdiag = jnp.einsum(
        "bnrqw,rs->bnrqsw",
        b_mats.reshape(bb, n_rt, rt, pooled_w, w),
        jnp.eye(rt, dtype=b_mats.dtype),
    )
    bdiag = bdiag.reshape(bb, n_rt, rt * pooled_w, rt * w)

    ct = min(chan_tile, c)
    assert c % ct == 0, "channel count must tile"
    grid = (bb, c // ct, n_rt)

    import functools as _ft

    out = pl.pallas_call(
        _ft.partial(_fused2_kernel, rt=rt, ph=pooled_h, pw=pooled_w, h=h, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rt * pooled_h, h),
                         lambda b_, c_, r_: (b_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rt * pooled_w, rt * w),
                         lambda b_, c_, r_: (b_, r_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, ct), lambda b_, c_, r_: (b_, 0, 0, c_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rt, pooled_h, pooled_w, ct),
            lambda b_, c_, r_: (b_, r_, 0, 0, c_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bb, rp, pooled_h, pooled_w, c), features.dtype
        ),
        interpret=interpret,
    )(a2, bdiag, features)
    return out[:, :r]
