"""ResNet-50-C4 backbone + res5 box-head stage, pure JAX (NHWC).

Rebuilds the reference's frozen feature extractor
(maskrcnn-benchmark ResNet with ``MODEL.BACKBONE.CONV_BODY="R-50-C4"``,
``mrcnn_modified/config/defaults.py:100``, out 1024 ch @ stride 16) with the
Detectron/Caffe2 conventions that the COCO checkpoint
``e2e_mask_rcnn_R-50-C4_1x`` assumes:

- **FrozenBatchNorm** everywhere (``defaults.py:276-278``): an affine
  ``y = x * scale + bias`` with ``scale = gamma / sqrt(var + eps)`` folded at
  load time — never updated, so it is just two constants per channel here.
- **stride_in_1x1** (``defaults.py:273``): the stride of a bottleneck sits on
  the first 1x1 conv, not the 3x3.
- Input is BGR 0-255 with per-channel mean subtraction
  (``defaults.py:51-55``); see data/transforms.py.
- The backbone is frozen in every on-line pipeline (the reference fixes
  ``FREEZE_CONV_BODY_AT`` and runs under no_grad) — so this module is
  inference-only by default, but it is a pure jittable/differentiable
  function, and the SGD baselines reuse it with gradients.

Layout: NHWC (TPU-native); params are plain nested dicts (pytrees) so they
shard/jit/checkpoint trivially. Conv compute in bfloat16 with f32
accumulation by default — free accuracy/speed trade on the MXU.

Stage layout (R-50): stem -> res2 x3 -> res3 x4 -> res4 x6 (= C4, stride 16).
res5 x3 (stride 2) is the box-head feature extractor applied to pooled RoIs
(``roi_box_feature_extractors.py:21-52``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# (blocks per stage) for ResNet-50
R50_STAGES = (3, 4, 6, 3)
STAGE_CHANNELS = ((64, 256), (128, 512), (256, 1024), (512, 2048))


def conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """2-D conv, NHWC x HWIO -> NHWC, SAME-style explicit padding to mirror
    torch Conv2d(padding=k//2).

    Dtype-following: the output (and the weight cast) takes x's dtype. At f32
    this is today's behavior — XLA's default TPU precision already runs the
    MXU in bf16 passes, and one dtype keeps the VJP well-typed for the SGD
    baselines. Feeding a bfloat16 x (``DetectorConfig.compute_dtype``) halves
    the activation HBM traffic, which is what bounds the backbone on v5e
    (measured 2.6 ms/img at 608x800 = 22 TFLOP/s: memory-, not MXU-bound);
    the MXU still accumulates in f32 internally."""
    k = w.shape[0]
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return out


def frozen_bn(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def conv_bn(x: jax.Array, p: Params, stride: int = 1, relu: bool = True) -> jax.Array:
    out = frozen_bn(conv(x, p["w"], stride), p["scale"], p["bias"])
    return jax.nn.relu(out) if relu else out


def bottleneck(x: jax.Array, p: Params, stride: int = 1) -> jax.Array:
    """Detectron bottleneck: 1x1(stride) -> 3x3 -> 1x1, + shortcut."""
    if "branch1" in p:
        shortcut = conv_bn(x, p["branch1"], stride, relu=False)
    else:
        shortcut = x
    out = conv_bn(x, p["branch2a"], stride)  # stride_in_1x1
    out = conv_bn(out, p["branch2b"], 1)
    out = conv_bn(out, p["branch2c"], 1, relu=False)
    return jax.nn.relu(out + shortcut)


def stage(x: jax.Array, blocks: List[Params], stride: int) -> jax.Array:
    x = bottleneck(x, blocks[0], stride)
    for b in blocks[1:]:
        x = bottleneck(x, b, 1)
    return x


def _stem_conv_s2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """The stem's 7x7 stride-2 pad-3 conv, computed as an ALGEBRAICALLY
    IDENTICAL 4x4 stride-1 conv on the 2x2 space-to-depth image.

    A 3-input-channel conv leaves 125 of the MXU's 128 contraction lanes
    idle — measured 1.0 ms/img of the backbone's 1.5 at 608x800 (68% of the
    whole trunk's time for 4% of its FLOPs). Space-to-depth (the standard
    MLPerf-ResNet stem transform) folds the stride-2 spatial taps into the
    channel axis: with u = di - 3 = 2m + p (m in [-2,1], p in {0,1}),

        out[i,j,o] = sum_{m,n,p,q,c} W[2m+p+3, 2n+q+3, c, o]
                                     * x[2(i+m)+p, 2(j+n)+q, c]
                   = conv4x4_pad(2,1)(S2D(x), W2)

    where S2D(x)[a,b,(p,q,c)] = x[2a+p, 2b+q, c] and W2 re-indexes W with
    zeros at the out-of-range taps (u = -4). Same FLOPs up to the zero taps,
    12 contraction channels instead of 3, identical output in exact
    arithmetic (unit-tested against the direct conv; f32 differs only by
    summation order). Measured on v5e: stem 1.0 -> ~0.3 ms/img."""
    b, h, wd, cin = x.shape
    k, _, _, cout = w.shape  # [7, 7, 3, 64]
    x2 = x.reshape(b, h // 2, 2, wd // 2, 2, cin)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * cin)
    # W2[(m+2), (n+2), (p,q,c), o] = W[2m+p+3, 2n+q+3, c, o]; index
    # u+4 = 2(m+2)+p over a front-zero-padded [8, 8] tap grid
    wpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8, 8, cin, cout]
    w2 = wpad.reshape(4, 2, 4, 2, cin, cout)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)
    return jax.lax.conv_general_dilated(
        x2,
        w2.astype(x.dtype),
        window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def stem(x: jax.Array, p: Params) -> jax.Array:
    """conv7x7/2 + frozen BN + relu + maxpool 3x3/2 (torch padding=1).

    The conv runs via the space-to-depth formulation (exact; see
    ``_stem_conv_s2d``) whenever the input's spatial dims are even — every
    production canvas is (sizes are /32); odd inputs fall back to the
    direct conv. On TPU in the production bfloat16 trunk dtype the whole
    stem dispatches to the fused Pallas kernel (``ops/stem_pool.py``):
    conv + BN + ReLU + maxpool in one VMEM-resident pass, skipping the
    ~125 MB/batch-8 HBM round-trip of the conv activation (measured
    4.46 -> 3.04 ms/batch-8 at 608x800 on v5e; 1-ulp-identical to this
    path, same MXU bf16 rounding)."""
    import os

    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0

    def _xla_stem(x):
        if even:
            y = jax.nn.relu(
                frozen_bn(_stem_conv_s2d(x, p["w"]), p["scale"], p["bias"])
            )
        else:
            y = conv_bn(x, p, stride=2)
        return jax.lax.reduce_window(
            y,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    # Fused-kernel eligibility: H % 32 guarantees the kernel's row tiling
    # ((H//4) % 8 == 0) — without it _pick_tile_rows falls back to ONE
    # full-height tile whose 2*H/4+1 f32 conv rows can blow the VMEM limit
    # on real hardware (round-3 advisor; production canvases are /32).
    # ODTPU_FUSED_STEM=0 is the kill-switch should the kernel misbehave on
    # a future libtpu build.
    if (
        x.shape[1] % 32 == 0
        and x.shape[2] % 4 == 0
        and x.dtype == jnp.bfloat16
        and os.environ.get("ODTPU_FUSED_STEM", "1") != "0"
    ):
        from online_detection_tpu.ops.stem_pool import stem_fused

        # decide per LOWERING platform, not via the process-global default
        # backend (which can disagree with the actual target under
        # jax.default_device / explicit placement — round-3 advisor)
        return jax.lax.platform_dependent(
            x,
            tpu=lambda xx: stem_fused(xx, p["w"], p["scale"], p["bias"]),
            default=_xla_stem,
        )
    return _xla_stem(x)


@jax.jit
def backbone_c4(params: Params, images: jax.Array) -> jax.Array:
    """images [N, H, W, 3] (BGR, mean-subtracted) -> C4 features
    [N, H/16, W/16, 1024]."""
    x = stem(images, params["stem"])
    x = stage(x, params["res2"], stride=1)
    x = stage(x, params["res3"], stride=2)
    x = stage(x, params["res4"], stride=2)
    return x


@jax.jit
def res5_head(params: Params, rois: jax.Array) -> jax.Array:
    """Pooled RoI features [R, 14, 14, 1024] -> res5 -> global avg pool
    [R, 2048] (the 2048-d detector features, ``box_head_getProposals.py:113-115``)."""
    x = stage(rois, params["res5"], stride=2)  # [R, 7, 7, 2048]
    return jnp.mean(x, axis=(1, 2))


def res5_feature_map(params: Params, rois: jax.Array) -> jax.Array:
    """res5 without pooling — the mask head shares these [R, 7, 7, 2048]
    features (``roi_mask_feature_extractors.py`` shares the box extractor)."""
    return stage(rois, params["res5"], stride=2)


# ---------------------------------------------------------------------------
# parameter construction


def _conv_bn_params(key, kh, kw, cin, cout) -> Params:
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        * (2.0 / (kh * kw * cin)) ** 0.5,
        "scale": jnp.ones((cout,), jnp.float32),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def init_resnet50_params(key: jax.Array, include_res5: bool = True) -> Params:
    """Random (He) init with the exact R-50 shape tree — for tests and as the
    schema the Caffe2/torch weight converters fill in."""
    keys = iter(jax.random.split(key, 64))
    params: Params = {"stem": _conv_bn_params(next(keys), 7, 7, 3, 64)}
    # Input-scale compensation: the data convention is Caffe2 BGR 0-255 with
    # mean subtraction ONLY (no std division, ``defaults.py:51-55``), so the
    # stem sees inputs with std ~64. Trained COCO weights absorb that scale;
    # a plain He init propagates it unchanged through the (variance-
    # preserving) trunk, giving 2048-d head features with norms ~5000 and
    # head logits in the hundreds — which made the SGD-baseline test diverge
    # and wastes bf16 mantissa range on TPU. Fold 1/64 into the stem so
    # random-init activations are unit-scale like a trained network's.
    params["stem"]["w"] = params["stem"]["w"] / 64.0
    cin = 64
    for si, (n_blocks, (mid, cout)) in enumerate(zip(R50_STAGES, STAGE_CHANNELS)):
        name = f"res{si + 2}"
        if si == 3 and not include_res5:
            break
        blocks = []
        for bi in range(n_blocks):
            p: Params = {
                "branch2a": _conv_bn_params(next(keys), 1, 1, cin, mid),
                "branch2b": _conv_bn_params(next(keys), 3, 3, mid, mid),
                "branch2c": _conv_bn_params(next(keys), 1, 1, mid, cout),
            }
            # zero-gamma-style damping: without trained BN statistics the
            # 16 residual adds would grow activations exponentially
            p["branch2c"]["scale"] = p["branch2c"]["scale"] * 0.1
            if bi == 0:
                p["branch1"] = _conv_bn_params(next(keys), 1, 1, cin, cout)
            blocks.append(p)
            cin = cout
        params[name] = blocks
    return params
