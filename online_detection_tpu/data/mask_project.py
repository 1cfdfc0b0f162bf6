"""Host-side GT-mask projection (NumPy twin of harvest.project_mask_on_box).

Crops a binary mask to a box and resamples it to MxM with the same separable
bilinear sampler the device version uses. The reference does this per-object
with PIL on the CPU and flags it as a bottleneck
(``mask_head_getProposals.py:16-46``); vectorized it costs microseconds, and
doing it host-side means the harvest uploads [G, 14, 14] floats (3 KB)
instead of canvas-resolution masks (MBs) — decisive on thin host->device
links.

The box is in the SAME coordinate frame as the mask; for canvas-frame boxes
with original-resolution masks pass ``box / scale``.
"""

from __future__ import annotations

import numpy as np


def _axis_weights(start: float, size: float, dim: int, out: int) -> np.ndarray:
    ks = np.arange(out, dtype=np.float64)
    pos = start + (ks + 0.5) / out * size - 0.5
    pos = np.clip(pos, 0.0, dim - 1.0)
    low = np.floor(pos)
    frac = pos - low
    grid = np.arange(dim, dtype=np.float64)[None, :]
    w_low = (grid == low[:, None]) * (1.0 - frac[:, None])
    w_high = (grid == low[:, None] + 1.0) * frac[:, None]
    return (w_low + w_high).astype(np.float32)  # [out, dim]


def project_mask_on_box_np(mask: np.ndarray, box, out: int = 14) -> np.ndarray:
    """mask [H, W] (0/1), box (x1, y1, x2, y2) -> [out, out] float."""
    h, w = mask.shape
    x1, y1, x2, y2 = [float(v) for v in box]
    bw = max(x2 - x1 + 1.0, 1.0)
    bh = max(y2 - y1 + 1.0, 1.0)
    wy = _axis_weights(y1, bh, h, out)
    wx = _axis_weights(x1, bw, w, out)
    return wy @ mask.astype(np.float32) @ wx.T


def project_masks_for_image(
    masks: np.ndarray,  # [G0, H0, W0] original-resolution masks
    boxes_canvas: np.ndarray,  # [G, 4] canvas-frame GT boxes
    scale: float,
    gt_cap: int,
    out: int = 14,
) -> np.ndarray:
    """-> [gt_cap, out, out] float32 (zero rows past the valid GTs)."""
    g = min(len(masks), len(boxes_canvas), gt_cap)
    result = np.zeros((gt_cap, out, out), np.float32)
    for j in range(g):
        result[j] = project_mask_on_box_np(
            masks[j], np.asarray(boxes_canvas[j]) / scale, out
        )
    return result
