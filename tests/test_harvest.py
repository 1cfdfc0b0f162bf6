"""Harvesting engine tests: sampling helpers, RPN/detector/mask chunk
semantics on constructed cases, and the full per-image pass + accumulator."""

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import (
    HarvestConfig,
    compact,
    harvest_detector,
    harvest_image,
    harvest_mask,
    harvest_rpn,
    masked_sample,
    project_mask_on_box,
    random_subsample,
)
from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors
from online_detection_tpu.models.detector import DetectorConfig, init_detector_params


def test_masked_sample_semantics(rng):
    mask = jnp.asarray([True, False, True, True, False, False])
    # count (3) <= n_out (5): take all, in order
    idx, valid = masked_sample(jax.random.key(0), mask, 5)
    assert np.asarray(idx[valid]).tolist() == [0, 2, 3]
    # count > n_out: sampled from valid rows only, all slots valid
    idx, valid = masked_sample(jax.random.key(1), mask, 2)
    assert bool(valid.all()) and bool(mask[idx].all())


def test_compact_and_subsample(rng):
    mask = jnp.asarray([False, True, True, False, True])
    idx, valid = compact(mask, 4)
    assert np.asarray(idx[valid]).tolist() == [1, 2, 4]
    # random_subsample: floor(frac*count) without replacement
    big = jnp.ones(100, bool)
    idx, valid = random_subsample(jax.random.key(0), big, 0.3, 64)
    assert int(valid.sum()) == 30
    assert len(set(np.asarray(idx[valid]).tolist())) == 30  # no repeats


def _toy_rpn_setup(rng, fh=4, fw=5, a_cls=3):
    anchors = grid_anchors(fh, fw, stride=16, sizes=(32,), ratios=(0.5, 1.0, 2.0))
    t = rng.normal(size=(fh, fw, 8)).astype(np.float32)
    return jnp.asarray(anchors), jnp.asarray(t)


def test_harvest_rpn_positive_and_feature_gather(rng):
    anchors, t = _toy_rpn_setup(rng)
    n = anchors.shape[0]
    vis = jnp.ones(n, bool)
    # GT identical to anchor index 7 -> that anchor is positive with target 0
    gt = jnp.concatenate([anchors[7:8], jnp.zeros((3, 4))], axis=0)
    gt_valid = jnp.asarray([True, False, False, False])
    cfg = HarvestConfig(num_anchor_classes=3, negatives_to_pick=6, rpn_pos_cap=8, gt_cap=4)
    chunk = harvest_rpn(jax.random.key(0), t, anchors, vis, gt, gt_valid, cfg)
    a7, loc7 = 7 % 3, 7 // 3
    # positive present in its anchor class with zero regression target
    pv = np.asarray(chunk.pos_valid[a7])
    assert pv.sum() >= 1
    feats = np.asarray(chunk.pos[a7][pv])
    want_feat = np.asarray(t).reshape(-1, 8)[loc7]
    assert any(np.allclose(f, want_feat, atol=1e-5) for f in feats)
    y = np.asarray(chunk.coxy_y[a7][pv])
    assert (np.abs(y) < 1e-4).any(axis=1).all() or np.allclose(y[0], 0, atol=1e-4)
    # negatives exist for every class and come from low-iou anchors
    assert all(np.asarray(chunk.neg_valid[a]).sum() > 0 for a in range(3))


def test_harvest_rpn_gt_rescue(rng):
    """A GT overlapping no anchor above 0.7 still yields its max-IoU anchor."""
    anchors, t = _toy_rpn_setup(rng)
    n = anchors.shape[0]
    vis = jnp.ones(n, bool)
    base = np.asarray(anchors[4])
    shifted = base + np.asarray([9.0, 9.0, 9.0, 9.0])  # moderate overlap < 0.7
    gt = jnp.asarray(np.stack([shifted] + [np.zeros(4)] * 3)).astype(jnp.float32)
    gt_valid = jnp.asarray([True, False, False, False])
    cfg = HarvestConfig(num_anchor_classes=3, negatives_to_pick=6, rpn_pos_cap=8, gt_cap=4)
    chunk = harvest_rpn(jax.random.key(0), t, anchors, vis, gt, gt_valid, cfg)
    assert sum(int(np.asarray(chunk.pos_valid[a]).sum()) for a in range(3)) >= 1


def test_harvest_detector_semantics(rng):
    g_cap, n_prop, n_cls, d = 4, 10, 3, 16
    feats = rng.normal(size=(g_cap + n_prop, d)).astype(np.float32)
    gt_boxes = np.array(
        [[10, 10, 50, 50], [100, 100, 150, 160], [0, 0, 0, 0], [0, 0, 0, 0]],
        np.float32,
    )
    gt_labels = jnp.asarray([1, 3, 0, 0])
    gt_valid = jnp.asarray([True, True, False, False])
    props = rng.uniform(0, 200, (n_prop, 4)).astype(np.float32)
    props[:, 2:] = props[:, :2] + 30
    props[0] = [12, 12, 52, 52]  # iou > 0.6 with gt 0
    boxes = jnp.asarray(np.concatenate([gt_boxes, props]))
    rows_valid = jnp.ones(g_cap + n_prop, bool)
    cfg = HarvestConfig(
        num_anchor_classes=3, num_classes=n_cls, negatives_to_pick=5,
        gt_cap=g_cap, coxy_cap=16,
    )
    chunk = harvest_detector(
        jax.random.key(0), jnp.asarray(feats), boxes, rows_valid,
        gt_labels, gt_valid, (300, 300), cfg,
    )
    # positives are exactly the valid GT rows' features
    np.testing.assert_allclose(np.asarray(chunk.pos[0]), feats[0])
    np.testing.assert_allclose(np.asarray(chunk.pos[1]), feats[1])
    assert np.asarray(chunk.pos_valid).tolist() == [True, True, False, False]
    # COXY contains the GT rows themselves (iou 1 with their own gt) and prop 0
    cv = np.asarray(chunk.coxy_valid)
    cc = np.asarray(chunk.coxy_c)[cv]
    assert (np.sort(cc) == np.sort(np.array([1.0, 3.0, 1.0]))).all()
    # negatives valid for all classes (class 2 absent -> sampled from all rows)
    assert all(np.asarray(chunk.neg_valid[c]).any() for c in range(n_cls))


def test_project_mask_and_harvest_mask(rng):
    h, w = 64, 64
    mask = np.zeros((h, w), np.float32)
    mask[16:48, 16:48] = 1.0
    box = jnp.asarray([16.0, 16.0, 47.0, 47.0])
    proj = np.asarray(project_mask_on_box(jnp.asarray(mask), box, 14))
    assert proj.shape == (14, 14)
    assert (proj > 0.5).mean() > 0.9  # box fully covered by mask

    g = 2
    feats = jnp.asarray(rng.normal(size=(g, 14, 14, 8)).astype(np.float32))
    masks = jnp.asarray(np.stack([mask, np.zeros_like(mask)]))
    boxes = jnp.asarray([[16, 16, 47, 47], [0, 0, 30, 30]]).astype(jnp.float32)
    labels = jnp.asarray([2, 1])
    valid = jnp.asarray([True, True])
    cfg = HarvestConfig(num_classes=3, mask_pix_cap=64, sampling_factor=0.3)
    masks14 = jax.vmap(lambda m, b: project_mask_on_box(m, b, 14))(masks, boxes)
    # host-side projection twin must agree with the device projection
    from online_detection_tpu.data.mask_project import project_mask_on_box_np

    np.testing.assert_allclose(
        project_mask_on_box_np(np.asarray(masks[0]), np.asarray(boxes[0])),
        np.asarray(masks14[0]), rtol=1e-5, atol=1e-5,
    )
    chunk = harvest_mask(jax.random.key(0), feats, masks14, labels, valid, cfg)
    # gt0: all pixels positive -> floor(0.3*196)=58 positives, 0 negatives
    assert int(chunk.pos_valid[0].sum()) == 58
    assert int(chunk.neg_valid[0].sum()) == 0
    # gt1: empty mask -> all pixels negative
    assert int(chunk.pos_valid[1].sum()) == 0
    assert int(chunk.neg_valid[1].sum()) == 58


def test_full_harvest_image_and_accumulator(rng):
    h, w = 128, 160
    fh, fw = h // 16, w // 16
    params = init_detector_params(jax.random.key(0), 15, 4)
    anchors = jnp.asarray(grid_anchors(fh, fw))
    vis = jnp.asarray(anchor_visibility(np.asarray(anchors), (w, h)))
    image = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
    gt_boxes = jnp.asarray([[20, 20, 80, 90], [50, 40, 120, 100], [0, 0, 0, 0]]).astype(jnp.float32)
    gt_labels = jnp.asarray([1, 3, 0])
    gt_valid = jnp.asarray([True, True, False])
    gt_masks = np.zeros((3, h, w), np.float32)
    gt_masks[0, 20:90, 20:80] = 1
    gt_masks[1, 40:100, 50:120] = 1
    hcfg = HarvestConfig(num_classes=3, negatives_to_pick=8, gt_cap=3, coxy_cap=64)
    dcfg = DetectorConfig(pre_nms_top_n=200, post_nms_top_n=50)
    chunk = harvest_image(
        jax.random.key(0), params, None, anchors, vis, image,
        jnp.asarray([w, h]), gt_boxes, gt_labels, gt_valid,
        jnp.asarray(gt_masks), hcfg, dcfg,
    )
    assert chunk.rpn.neg.shape == (15, 8, 1024)
    assert chunk.det.pos.shape == (3, 2048)
    assert chunk.mask.pos.shape == (3, 64, 256)
    assert 0.0 <= float(chunk.average_recall) <= 1.0

    acc = HarvestAccumulator(15, 3)
    for _ in range(3):
        acc.add(chunk)
    out = acc.finalize(
        rpn_iterations=2, rpn_batch_size=16, det_iterations=2, det_batch_size=8,
        segm_batch_size=128,
    )
    assert out["rpn"]["neg"].shape == (15, 2, 16, 1024)
    assert out["det"]["neg"].shape == (3, 2, 8, 2048)
    assert out["det"]["pos_valid"][0].sum() == 3  # gt cls1 x 3 images
    assert out["det"]["coxy"]["X"].shape[1] == 2048
    assert len(out["det"]["coxy"]["C"]) == len(out["det"]["coxy"]["Y"])
    assert out["mask"]["pos"].shape[-1] == 256
