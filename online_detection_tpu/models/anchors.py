"""Anchor grid generation with Detectron's exact rounding semantics.

Mirrors the reference's ``modeling/rpn/anchor_generator.py`` (itself the
Detectron recipe): 15 anchors/location = 5 sizes x 3 aspect ratios
(``defaults.py:132-137``), stride 16, and the ratio-major ordering the
per-anchor FALKON classifiers index into (``MINIBOOTSTRAP.RPN.NUM_CLASSES=15``,
``defaults.py:483``). The +-rounding in the ratio enumeration is replicated
because the on-line RPN treats each anchor shape as a distinct classifier
class — off-by-one anchor shapes would silently shift every downstream model.

Anchors are a deterministic function of (stride, sizes, ratios, H, W), so the
grid is precomputed host-side once per feature-map size (NumPy) and handed to
jitted code as a constant — matching the reference's one-time caching
(``rpn.py:277-278``).

The visibility ("straddle") filter marks anchors that stay inside the image
within ``straddle_thresh`` (0 by default): ``rpn_getProposals.py`` only
harvests features at visible anchors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def base_anchors(
    stride: int = 16,
    sizes: Sequence[int] = (32, 64, 128, 256, 512),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[A, 4] ratio-major base anchors centered on the first stride cell,
    xyxy with the +1 convention (Detectron `generate_anchors`)."""
    scales = np.asarray(sizes, np.float64) / stride
    base = np.array([0, 0, stride - 1, stride - 1], np.float64)

    def whctr(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, cx, cy):
        ws = ws[:, None]
        hs = hs[:, None]
        return np.hstack(
            [
                cx - 0.5 * (ws - 1),
                cy - 0.5 * (hs - 1),
                cx + 0.5 * (ws - 1),
                cy + 0.5 * (hs - 1),
            ]
        )

    w, h, cx, cy = whctr(base)
    size = w * h
    size_ratios = size / np.asarray(ratios, np.float64)
    ws = np.round(np.sqrt(size_ratios))  # Detectron rounds here
    hs = np.round(ws * np.asarray(ratios, np.float64))
    ratio_anchors = mkanchors(ws, hs, cx, cy)

    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, cx, cy = whctr(ratio_anchors[i])
        ws = w * scales
        hs = h * scales
        out.append(mkanchors(ws, hs, cx, cy))
    return np.vstack(out).astype(np.float32)  # [len(ratios)*len(scales), 4]


def grid_anchors(
    feat_h: int,
    feat_w: int,
    stride: int = 16,
    sizes: Sequence[int] = (32, 64, 128, 256, 512),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """Full anchor grid [H*W*A, 4], ordered (y, x, anchor) like the
    reference's flattened (A, H, W) -> permute layout after
    ``permute_and_flatten`` (location-major, anchor fastest)."""
    cell = base_anchors(stride, sizes, ratios)  # [A, 4]
    sx = np.arange(feat_w, dtype=np.float32) * stride
    sy = np.arange(feat_h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)  # [H, W]
    shifts = np.stack(
        [shift_x, shift_y, shift_x, shift_y], axis=-1
    ).reshape(-1, 1, 4)  # [H*W, 1, 4]
    return (shifts + cell[None]).reshape(-1, 4)  # [H*W*A, 4]


def anchor_visibility(
    anchors: np.ndarray,
    image_size: Tuple[int, int],  # (width, height)
    straddle_thresh: float = 0.0,
) -> np.ndarray:
    """Straddle filter (``STRADDLE_THRESH=0``, ``defaults.py:139-141``)."""
    w, h = image_size
    if straddle_thresh < 0:
        return np.ones(anchors.shape[0], bool)
    return (
        (anchors[:, 0] >= -straddle_thresh)
        & (anchors[:, 1] >= -straddle_thresh)
        & (anchors[:, 2] < w + straddle_thresh)
        & (anchors[:, 3] < h + straddle_thresh)
    )
