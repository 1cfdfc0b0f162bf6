"""Anchor generation vs the reference implementation, executed directly from
the read-only reference checkout as a golden oracle (no code copied)."""

import pathlib

import numpy as np
import pytest

from online_detection_tpu.models.anchors import (
    anchor_visibility,
    base_anchors,
    grid_anchors,
)

REF = pathlib.Path(
    "/root/reference/src/modules/feature-extractor/mrcnn_modified/modeling/rpn/anchor_generator.py"
)


def _load_reference_generate_anchors():
    """Exec only the standalone anchor-math functions from the reference file
    (the module itself imports unavailable packages)."""
    if not REF.exists():
        pytest.skip("reference checkout not available")
    src = REF.read_text()
    tail = src[src.index("def generate_anchors(") :]
    import math, torch  # noqa

    class _NpShim:  # the reference predates NumPy 1.24 (`np.float` alias)
        float = float

        def __getattr__(self, name):
            return getattr(np, name)

    ns = {"math": math, "np": _NpShim(), "torch": torch}
    exec(compile(tail, str(REF), "exec"), ns)
    return ns["generate_anchors"]


def test_base_anchors_match_reference():
    gen = _load_reference_generate_anchors()
    want = gen(
        stride=16, sizes=(32, 64, 128, 256, 512), aspect_ratios=(0.5, 1.0, 2.0)
    ).numpy()
    got = base_anchors(16, (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    assert got.shape == (15, 4)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_base_anchors_other_config():
    gen = _load_reference_generate_anchors()
    want = gen(stride=8, sizes=(64, 128), aspect_ratios=(0.5, 2.0)).numpy()
    got = base_anchors(8, (64, 128), (0.5, 2.0))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_grid_layout():
    g = grid_anchors(2, 3, stride=16)
    assert g.shape == (2 * 3 * 15, 4)
    # anchor-minor ordering: first 15 rows share the (0,0) shift
    base = base_anchors(16)
    np.testing.assert_allclose(g[:15], base)
    # row 15 starts the x=16 shift
    np.testing.assert_allclose(g[15:30], base + np.array([16, 0, 16, 0], np.float32))
    # row 45 starts the y=16 row
    np.testing.assert_allclose(g[45:60], base + np.array([0, 16, 0, 16], np.float32))


def test_visibility_filter():
    g = grid_anchors(38, 50, stride=16)
    vis = anchor_visibility(g, (800, 608), straddle_thresh=0)
    # all visible anchors are strictly inside
    assert vis.any() and not vis.all()
    inside = (g[:, 0] >= 0) & (g[:, 1] >= 0) & (g[:, 2] < 800) & (g[:, 3] < 608)
    np.testing.assert_array_equal(vis, inside)
    # straddle disabled -> everything visible
    assert anchor_visibility(g, (800, 608), straddle_thresh=-1).all()
