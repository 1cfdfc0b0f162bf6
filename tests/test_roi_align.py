"""RoIAlign vs a scalar NumPy implementation of the legacy Detectron
algorithm (csrc ROIAlign semantics: no half-pixel offset, adaptive
sampling_ratio=0, bilinear with the -1..size clamping rules), and vs
torchvision's roi_align (aligned=False) when available."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from online_detection_tpu.ops.roi_align import roi_align


def bilinear_np(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[2], feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(np.floor(y))
    x_low = int(np.floor(x))
    if y_low >= h - 1:
        y_low = y_high = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_low = x_high = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * feat[y_low, x_low]
        + hy * lx * feat[y_low, x_high]
        + ly * hx * feat[y_high, x_low]
        + ly * lx * feat[y_high, x_high]
    )


def roi_align_np(feat, rois, pooled, scale, sampling_ratio=0):
    out = np.zeros((len(rois), pooled, pooled, feat.shape[2]), np.float32)
    for r, roi in enumerate(rois):
        sw, sh = roi[0] * scale, roi[1] * scale
        ew, eh = roi[2] * scale, roi[3] * scale
        rw = max(ew - sw, 1.0)
        rh = max(eh - sh, 1.0)
        bw, bh = rw / pooled, rh / pooled
        ngh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rh / pooled))
        ngw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(rw / pooled))
        for ph in range(pooled):
            for pw in range(pooled):
                acc = np.zeros(feat.shape[2], np.float32)
                for iy in range(ngh):
                    y = sh + ph * bh + (iy + 0.5) * bh / ngh
                    for ix in range(ngw):
                        x = sw + pw * bw + (ix + 0.5) * bw / ngw
                        acc += bilinear_np(feat, y, x)
                out[r, ph, pw] = acc / (ngh * ngw)
    return out


def test_roi_align_matches_scalar_reference(rng):
    h, w, c = 25, 32, 5
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    rois = np.array(
        [
            [16.0, 16.0, 200.0, 180.0],   # medium box
            [0.0, 0.0, 511.0, 399.0],     # large box -> multiple samples/bin
            [100.0, 50.0, 110.0, 60.0],   # small box < 1 feature cell
            [-10.0, -10.0, 40.0, 40.0],   # out-of-range samples
        ],
        np.float32,
    )
    want = roi_align_np(feat, rois, 7, 1 / 16.0)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0, max_samples=8)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_matches_torchvision(rng):
    torch = pytest.importorskip("torch")
    tv_ops = pytest.importorskip("torchvision.ops")
    h, w, c = 19, 23, 3
    feat = rng.normal(size=(h, w, c)).astype(np.float32)
    rois = np.abs(rng.normal(size=(6, 4)).astype(np.float32)) * 100
    rois[:, 2:] += rois[:, :2] + 8
    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]
    t_rois = torch.cat([torch.zeros(6, 1), torch.from_numpy(rois)], dim=1)
    want = tv_ops.roi_align(
        t_feat, t_rois, output_size=7, spatial_scale=1 / 16.0,
        sampling_ratio=0, aligned=False,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 7, 7, 1 / 16.0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_align_14x14_shape(rng):
    feat = rng.normal(size=(38, 50, 8)).astype(np.float32)
    rois = np.array([[10.0, 10.0, 300.0, 500.0]], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois))
    assert out.shape == (1, 14, 14, 8)


def test_roi_align_bf16_follows_dtype(rng):
    """bf16 features -> bf16 pooled output tracking the f32 result (the
    halved-intermediate production path; coordinate math stays f32)."""
    feats = rng.normal(size=(12, 16, 8)).astype(np.float32)
    rois = np.array([[5.0, 8.0, 120.0, 150.0], [0.0, 0.0, 40.0, 30.0]], np.float32)
    f32 = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois), 7, 7, 1 / 16.0))
    out = roi_align(jnp.asarray(feats, jnp.bfloat16), jnp.asarray(rois), 7, 7, 1 / 16.0)
    assert out.dtype == jnp.bfloat16
    scale = np.abs(f32).max()
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), f32, atol=0.03 * scale)


def test_fused_pallas_kernel_matches_separable_interpret():
    """roi_align_batched (Pallas, interpret mode) == vmapped separable path —
    the equivalence that lets the kernel stand in for the XLA formulation on
    any backend. (On v5e the match is bit-exact; interpret mode reassociates
    so tolerance is fp32-eps scale.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from online_detection_tpu.ops.roi_align import roi_align, roi_align_batched

    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.normal(size=(2, 18, 24, 256)).astype(np.float32))
    raw = rng.uniform(0, 350, size=(2, 37, 4)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([np.minimum(raw[..., :2], raw[..., 2:]),
                        np.maximum(raw[..., :2], raw[..., 2:])], -1)
    )
    ref = jax.vmap(lambda f, b: roi_align(f, b, 14, 14, 1 / 16.0, 8))(feats, rois)
    fused = roi_align_batched(feats, rois, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)


def test_fused2_kernel_matches_separable_interpret(rng):
    """roi_align_fused2 (block-diagonal stage-2 Pallas kernel) computes the
    exact separable-path pooling, including RoI-tile padding (R=5, tile 4).
    Interpret mode; the TPU measurement verdict lives in the docstring."""
    from online_detection_tpu.ops.roi_align import roi_align, roi_align_fused2

    b, h, w, c = 2, 10, 12, 8
    feats = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    x1 = rng.uniform(0, 100, (b, 5)); y1 = rng.uniform(0, 80, (b, 5))
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + rng.uniform(5, 90, (b, 5)),
         y1 + rng.uniform(5, 70, (b, 5))], -1).astype(np.float32))
    ref = jax.vmap(lambda f, r: roi_align(f, r, 4, 4, 1 / 16.0, 8))(feats, rois)
    got = roi_align_fused2(feats, rois, 4, 4, 1 / 16.0, 8,
                           roi_tile=4, chan_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
