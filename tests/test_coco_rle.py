"""COCO compressed-RLE encoder tests (fast tier): exact round-trip, the
column-major/leading-zero conventions, and handcrafted goldens of the
pycocotools wire format (``maskApi.c rleToString`` 5-bit difference coding)
so byte-layout drift is caught without pycocotools installed."""

import numpy as np

from online_detection_tpu.data.evaluation.coco_rle import (
    _counts_from_mask,
    _counts_from_string,
    _counts_to_string,
    masks_to_coco_format,
    rle_area,
    rle_decode,
    rle_encode,
)


def test_counts_column_major_leading_zero():
    m = np.zeros((3, 4), np.uint8)
    m[1, 0] = 1  # col-major index 1
    m[:, 2] = 1  # col-major indices 6, 7, 8
    assert _counts_from_mask(m) == [1, 1, 4, 3, 3]
    # mask starting with a foreground pixel still leads with a 0 count
    m2 = np.ones((2, 2), np.uint8)
    assert _counts_from_mask(m2) == [0, 4]
    assert _counts_from_mask(np.zeros((2, 2), np.uint8)) == [4]


def test_string_coding_roundtrip_small_and_negative_diffs():
    # difference coding kicks in at i > 2 and can go negative: exercise both
    for counts in ([1, 1, 4, 3, 3], [0, 4], [4], [100, 2, 50, 700, 3, 1],
                   [5, 1000, 5, 1, 5, 1]):
        s = _counts_to_string(counts)
        assert _counts_from_string(s) == counts
        assert all(48 <= b <= 48 + 63 for b in s)  # printable window


def test_wire_format_goldens():
    """Byte-for-byte goldens, hand-derived from the rleToString algorithm
    (values verified by the decoder, layout pinned against regressions)."""
    assert _counts_to_string([4]) == b"4"          # 4 -> '4'
    assert _counts_to_string([0, 4]) == b"04"      # 0 -> '0', 4 -> '4'
    # 31 needs two groups: low 5 bits 0x1f (cont) then 0 with sign bit clear
    assert _counts_to_string([31]) == bytes([0x1F + 48 + 0x20, 0 + 48])
    # i>2 difference coding: [1,1,4,3,3] -> diffs [1,1,4,2,-1]
    assert _counts_from_string(_counts_to_string([1, 1, 4, 3, 3])) == [1, 1, 4, 3, 3]
    golden = _counts_to_string([1, 1, 4, 3, 3])
    # -1 encodes as single group 0x1f with the 0x10 sign bit and no cont
    assert golden[-1] == 0x1F + 48


def test_roundtrip_random_masks():
    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = rng.integers(1, 40, 2)
        mask = (rng.uniform(size=(h, w)) > rng.uniform(0.2, 0.8)).astype(np.uint8)
        rle = rle_encode(mask)
        assert rle["size"] == [h, w]
        np.testing.assert_array_equal(rle_decode(rle), mask)
        assert rle_area(rle) == int(mask.sum())


def test_masks_to_coco_format():
    probs = np.zeros((2, 6, 5), np.float32)
    probs[0, :3, :2] = 0.9
    probs[1, 4:, :] = 0.7
    out = masks_to_coco_format(probs, np.array([3, 7]), np.array([0.8, 0.6]),
                               image_id="img_0001")
    assert [o["category_id"] for o in out] == [3, 7]
    for o, m in zip(out, probs > 0.5):
        seg = dict(o["segmentation"], counts=o["segmentation"]["counts"].encode())
        np.testing.assert_array_equal(rle_decode(seg), m.astype(np.uint8))
        assert isinstance(o["segmentation"]["counts"], str)  # JSON-ready
