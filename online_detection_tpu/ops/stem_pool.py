"""Fused ResNet stem: conv7x7/2 + frozen BN + ReLU + maxpool3x3/2 in one
Pallas kernel.

Replaces the stem of ``models/resnet.backbone_c4`` on TPU (SURVEY.md §2.3's
conv trunk; reference: torch's fused cudnn stem). The XLA lowering
materializes the [B, H/2, W/2, 64] conv activation in HBM (~125 MB per
batch-8 600 px canvas in bf16) just to read it back for the maxpool —
measured 0.57 ms/img of the backbone's 1.7 (BASELINE.md roofline table),
for 4% of its FLOPs. This kernel keeps the conv activation in VMEM: per
grid step it computes a band of conv rows from the space-to-depth input
(the exact algebraic reformulation of ``resnet._stem_conv_s2d``), applies
BN + ReLU on the f32 accumulator, max-pools, and writes only the pooled
[TR, 64, W/4] tile.

Layouts (chosen for the TPU's (sublane, lane) tiling):

- input ``xs`` [B, H2p, 16, W2p]: s2d image with the 12 (p, q, c) channels
  zero-padded to 16 so that a 4-row slice [4, 16, W2p] reshapes
  layout-contiguously into one [64, W2p] tile (16 is exactly one bf16
  sublane tile) — the conv then runs as FOUR 64-deep MXU contractions per
  output row (one per horizontal tap) instead of sixteen 12-deep ones.
  Rows padded (3, 2) and cols (2, 1) with zeros (H2p = H/2 + 5,
  W2p = W/2 + 3). Mosaic supports neither strided lane slices nor
  sublane<->lane shape casts, so the stride-2 column downsample is a
  one-hot MXU matmul and the row loop is a small static unroll.
- weights ``wb`` [4*64, 64]: tap b's block [64, 64] holds the s2d kernel
  rows (a, ch) with ch zero-padded 12 -> 16.
- output [B, H/4, 64, W/4] (the caller transposes to NHWC; XLA fuses that
  into the consumer).

Exactness: identical arithmetic to conv+bn+relu+pool up to the MXU's
bf16-input rounding (same as the production bf16 trunk; the conv
accumulates in f32 via ``preferred_element_type``) and f32 summation
order. The maxpool's zero padding is exact because ReLU outputs are >= 0,
and the one-hot column select runs at HIGHEST precision for f32 inputs so
picked values are never rounded. Unit-tested against ``resnet.stem`` in
interpret mode (CPU) and on device (tests/test_resnet.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stem_weights_s2d(w: jax.Array) -> jax.Array:
    """[7, 7, 3, 64] stem conv kernel -> [192, 64] s2d-flattened weights
    (same transform as ``resnet._stem_conv_s2d``; zero taps at u = -4)."""
    cin, cout = w.shape[2], w.shape[3]
    wpad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # [8, 8, cin, cout]
    w2 = wpad.reshape(4, 2, 4, 2, cin, cout)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)
    return w2.reshape(16 * 4 * cin, cout)  # 192 for the 3-channel stem


def _stem_weights_tapmajor(w: jax.Array) -> jax.Array:
    """[7, 7, 3, 64] -> [4*64, 64]: per-tap-b blocks of (a, ch16) rows."""
    cout = w.shape[3]
    w2 = stem_weights_s2d(w).reshape(4, 4, 12, cout)  # [a, b, ch, out]
    w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, 4), (0, 0)))  # ch 12 -> 16
    w2 = w2.transpose(1, 0, 2, 3)  # [b, a, 16, out]
    return w2.reshape(4 * 64, cout)


def _pick_tile_rows(h4: int, cap: int = 32) -> int:
    """Largest divisor of the pooled row count <= cap that satisfies the
    TPU block constraint (sublane dim divisible by 8, or the full dim)."""
    for tr in range(min(cap, h4), 0, -1):
        if h4 % tr == 0 and tr % 8 == 0:
            return tr
    return h4  # single tile: block equals the array dim, always legal


def _stem_kernel(
    x_ref, w_ref, s_ref, b_ref, o_ref, *, tr: int, w2_cols: int, exact: bool
):
    """One (image, row-tile) step: conv rows [2*i0-1, 2*i0+2*tr-1] from the
    padded s2d image, BN+ReLU, 3x3/2 maxpool -> pooled rows [i0, i0+tr)."""
    t = pl.program_id(1)
    n_conv = 2 * tr + 1
    w4 = w2_cols // 2
    scale = s_ref[:].reshape(1, 64).T  # [64, 1]
    bias = b_ref[:].reshape(1, 64).T
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (w2_cols, w4), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (w2_cols, w4), 1)
    sel = (k_ids == 2 * j_ids).astype(
        jnp.float32 if exact else x_ref.dtype
    )  # stride-2 col downsample as a one-hot matmul

    # conv rows: tile t's conv row k (local, k in [0, 2tr]) is global row
    # 2*tr*t + k - 1 and reads s2d-padded rows (base + k) .. (base + k + 3)
    # precision pinned EXPLICITLY on every dot: Mosaic rejects an fp32
    # contract precision on bf16 operands ("Bad lhs type"), so inheriting a
    # process-global jax_default_matmul_precision=highest must not leak in
    # (bf16 operands already accumulate in f32 via preferred_element_type)
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT

    base = 2 * tr * t
    crows = []
    for k in range(n_conv):
        x4 = x_ref[0, pl.ds(base + k, 4), :, :]  # [4, 16, W2p]
        x4 = x4.reshape(64, x4.shape[-1])  # contiguous sublane merge
        c = jnp.zeros((64, w2_cols), jnp.float32)
        for b in range(4):
            # tap b: lane slice; one 64-deep MXU contraction per tap
            c += jax.lax.dot_general(
                w_ref[pl.ds(b * 64, 64), :],  # [64, 64] (a, ch16 rows)
                x4[:, b : b + w2_cols],  # [64, W2]
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        c = jnp.maximum(c * scale + bias, 0.0)
        if k == 0:
            # conv local row 0 is global row 2*i0 - 1: at t == 0 that is
            # the pool's top padding row -> zero it (exact: ReLU rows are
            # >= 0, so a 0 pad never changes a 3-row max)
            c = jnp.where(t == 0, 0.0, c)
        crows.append(c)

    # rows first (3 conv rows -> 1 pooled row), then columns: only tr
    # column passes instead of 2*tr+1
    pooled = []
    for i in range(tr):
        r = jnp.maximum(
            jnp.maximum(crows[2 * i], crows[2 * i + 1]), crows[2 * i + 2]
        )  # [64, W2]
        rp = jnp.pad(r, ((0, 0), (1, 1)))
        m3 = jnp.maximum(
            jnp.maximum(rp[:, 0:w2_cols], rp[:, 1 : w2_cols + 1]),
            rp[:, 2 : w2_cols + 2],
        )
        pooled.append(m3 if exact else m3.astype(x_ref.dtype))
    stackd = jnp.concatenate(pooled, axis=0)  # [tr*64, W2]
    out = jax.lax.dot_general(  # one batched one-hot select for the tile
        stackd,
        sel,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [tr*64, W4]
    o_ref[0] = out.reshape(tr, 64, w4).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_fused(
    x: jax.Array,  # [B, H, W, 3] (H, W even), any float dtype
    w: jax.Array,  # [7, 7, 3, 64]
    scale: jax.Array,  # [64]
    bias: jax.Array,  # [64]
    interpret: bool = False,
) -> jax.Array:
    """Fused stem -> [B, H/4, W/4, 64] (NHWC, matching ``resnet.stem``)."""
    b, h, wd, cin = x.shape
    h2, w2c = h // 2, wd // 2
    h4, w4 = h2 // 2, w2c // 2
    tr = _pick_tile_rows(h4)
    # bf16 inputs round on the MXU anyway (production trunk dtype), so the
    # pooling/select path may stay in the input dtype; f32 inputs demand
    # the exact (f32 + HIGHEST-select) path
    exact = x.dtype == jnp.float32

    # s2d with channel order (p, q, c) (matching stem_weights_s2d), padded
    # 12 -> 16 so a [4, 16, W2p] row slice merges into one [64, W2p] tile
    xs = x.reshape(b, h2, 2, w2c, 2, cin)
    xs = xs.transpose(0, 1, 2, 4, 5, 3).reshape(b, h2, 4 * cin, w2c)
    xs = jnp.pad(xs, ((0, 0), (3, 2), (0, 16 - 4 * cin), (2, 1)))

    wb = _stem_weights_tapmajor(w).astype(x.dtype)  # [256, 64]
    h2p, w2p = h2 + 5, w2c + 3

    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, tr=tr, w2_cols=w2c, exact=exact
        ),
        grid=(b, h4 // tr),
        in_specs=[
            pl.BlockSpec(
                (1, h2p, 16, w2p),
                lambda i, t: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (256, 64), lambda i, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((64,), lambda i, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((64,), lambda i, t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, 64, w4), lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h4, 64, w4), x.dtype),
        interpret=interpret,
    )(xs, wb, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out.transpose(0, 1, 3, 2)  # [B, H4, 64, W4] -> NHWC
