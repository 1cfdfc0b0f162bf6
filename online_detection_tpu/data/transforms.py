"""Image preprocessing matching the reference's Caffe2 conventions.

``engine/inference.py:114-141`` + maskrcnn-benchmark transforms: resize so the
min side is 600 (capped at max side 1333), convert RGB->BGR, scale to 0-255,
subtract the Detectron pixel means (``defaults.py:43-55``), pad to a
32-divisible canvas (ImageList). GT boxes scale with the image.

Host-side NumPy — this runs in the data loader thread, not on the TPU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7750], np.float32)


def resize_scale(w: int, h: int, min_size: int = 600, max_size: int = 1333) -> float:
    """maskrcnn-benchmark Resize: scale so min side == min_size unless the max
    side would exceed max_size."""
    size = min_size
    mx = max(w, h)
    mn = min(w, h)
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return 1.0
    return size / mn


def scaled_size(w: int, h: int, min_size: int = 600,
                max_size: int = 1333) -> Tuple[int, int]:
    """(scaled_w, scaled_h) with the reference's exact output-size
    arithmetic: both of its resize paths — torchvision ``T.Resize(min)`` in
    the engines' ``build_transform`` and maskrcnn-benchmark
    ``Resize.get_size`` in the baseline dataloader — TRUNCATE the long side
    (``int(size * long / short)``), they don't round. Identical to rounding
    at the shipped 640x480 datasets; differs by one pixel at sizes where
    ``size * long / short`` has fractional part >= 0.5 (and one conv canvas
    pixel changes every downstream activation). Box coordinates still scale
    with the scalar ``resize_scale`` ratio: the reference resizes boxes with
    per-axis ratios (scaled/orig), which differ from the scalar by <1e-3 px
    only on those same fractional sizes."""
    size = min_size
    mx, mn = max(w, h), min(w, h)
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if (w <= h and w == size) or (h <= w and h == size):
        return w, h
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size


def canvas_size(w: int, h: int, min_size: int = 600, max_size: int = 1333,
                divisibility: int = 32) -> Tuple[int, int]:
    """(canvas_h, canvas_w) for a raw image size — scaled then ceil to /32."""
    sw, sh = scaled_size(w, h, min_size, max_size)
    pad = lambda v: (v + divisibility - 1) // divisibility * divisibility
    return pad(sh), pad(sw)


def preprocess_image(
    rgb: np.ndarray,  # [H, W, 3] uint8 RGB
    canvas_hw: Tuple[int, int],
    min_size: int = 600,
    max_size: int = 1333,
):
    """-> (canvas [ch, cw, 3] float32 BGR mean-subtracted, scale,
    (scaled_w, scaled_h))."""
    h, w = rgb.shape[:2]
    s = resize_scale(w, h, min_size, max_size)
    sw, sh = scaled_size(w, h, min_size, max_size)
    if (sw, sh) != (w, h):
        try:
            import PIL.Image as PILImage

            img = PILImage.fromarray(rgb).resize((sw, sh), PILImage.BILINEAR)
            rgb = np.asarray(img)
        except ImportError:  # pragma: no cover
            from numpy import floor

            yi = np.clip((np.arange(sh) + 0.5) * h / sh - 0.5, 0, h - 1)
            xi = np.clip((np.arange(sw) + 0.5) * w / sw - 0.5, 0, w - 1)
            rgb = rgb[np.round(yi).astype(int)][:, np.round(xi).astype(int)]
    bgr = rgb[..., ::-1].astype(np.float32) - PIXEL_MEAN_BGR
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:sh, :sw] = bgr[:ch, :cw]
    return canvas, s, (sw, sh)


def preprocess_image_u8(
    rgb: np.ndarray,  # [H, W, 3] uint8 RGB
    canvas_hw: Tuple[int, int],
    min_size: int = 600,
    max_size: int = 1333,
):
    """uint8 variant: resize + pad only; BGR/mean-subtraction happens on
    device (``normalize_canvas``). A uint8 canvas is 4x smaller on the
    host->device link — that link is the throughput ceiling on tunneled
    dev chips and non-negligible even on PCIe."""
    h, w = rgb.shape[:2]
    s = resize_scale(w, h, min_size, max_size)
    sw, sh = scaled_size(w, h, min_size, max_size)
    if (sw, sh) != (w, h):
        import PIL.Image as PILImage

        rgb = np.asarray(PILImage.fromarray(rgb).resize((sw, sh), PILImage.BILINEAR))
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[: min(sh, ch), : min(sw, cw)] = rgb[:ch, :cw]
    return canvas, s, (sw, sh)


def normalize_canvas(canvas):
    """Device-side half of preprocessing: uint8 RGB -> f32 BGR minus pixel
    means. Accepts f32 input unchanged (already normalized host-side)."""
    import jax.numpy as jnp

    if canvas.dtype == jnp.uint8:
        bgr = canvas[..., ::-1].astype(jnp.float32)
        return bgr - jnp.asarray(PIXEL_MEAN_BGR)
    return canvas


def scale_boxes(boxes: np.ndarray, scale: float) -> np.ndarray:
    """BoxList.resize semantics for uniform scaling: plain coordinate scale."""
    return boxes * scale
