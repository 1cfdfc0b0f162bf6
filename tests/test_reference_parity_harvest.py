"""Differential parity of the HARVESTING heads against the literal reference.

The reference's per-image feature-harvesting meta-architectures are runnable
on CPU torch once their external factory imports are stubbed
(tests/ref_shims.py):

- ``rpn_getProposals.py`` (RPNModule.forward, with its REAL
  anchor_generator.py sibling) vs ``engine/harvest.harvest_rpn``;
- ``box_head_getProposals.py`` (ROIBoxHead.forward_train) vs
  ``engine/harvest.harvest_detector``;
- ``mask_head_getProposals.py`` (ROIMaskHead.forward) vs
  ``engine/harvest.harvest_mask``;
- ``average_recall.py`` vs ``engine/harvest.average_recall``.

Both sides see identical synthetic features/boxes; sampling is pinned to one
deterministic index scheme (``deterministic_torch_sampling`` on the torch
side, ``HarvestConfig.parity_sampling`` on ours), so the comparison is
exact-to-f32 on membership, ordering (where the reference's ordering is
per-pool) and regression targets.

Known intentional deviation (documented in ``engine/harvest.masked_sample``):
the production sampler never emits duplicate rows when a pool underfills the
pick count, while the reference detector head resamples with replacement;
``parity_sampling`` reproduces the reference's duplicates so the comparison
stays exact.
"""

import math
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.harvest import (
    HarvestConfig,
    average_recall,
    harvest_detector,
    harvest_mask,
    harvest_rpn,
)
from tests.ref_shims import (
    RefCfg,
    StubBoxFeatureExtractor,
    StubConv5Mask,
    StubMaskPredictor,
    StubSegmentationMasks,
    deterministic_torch_sampling,
    legacy_torch,
    load_average_recall_module,
    load_box_head_harvest_module,
    load_mask_head_harvest_module,
    load_rpn_harvest_module,
)


def _boxlist(bbox_np, size):
    import sys

    BoxList = sys.modules["maskrcnn_benchmark.structures.bounding_box"].BoxList
    return BoxList(torch.tensor(np.asarray(bbox_np), dtype=torch.float32), size)


def _sorted_rows(a):
    a = np.asarray(a, dtype=np.float64)
    if a.size == 0:
        return a
    return a[np.lexsort(a.T[::-1])]


def _assert_same_rows(got, want, atol=1e-5, context=""):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, f"{context}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-5, err_msg=context)


# --------------------------------------------------------------------------
# RPN harvesting


RPN_IMG_W, RPN_IMG_H = 48, 40  # 6x5 feature grid at stride 8
RPN_A = 6  # 2 sizes x 3 ratios


def _rpn_cfg(iterations=2, batch_size=8, num_images=2):
    return RefCfg(
        SAVE_FEATURES_RPN=False,
        NUM_IMAGES=num_images,
        MODEL=RefCfg(
            RETINANET_ON=False,
            RPN=RefCfg(
                ANCHOR_SIZES=(16, 32),
                ASPECT_RATIOS=(0.5, 1.0, 2.0),
                ANCHOR_STRIDE=(8,),
                STRADDLE_THRESH=0,
                USE_FPN=False,
                RPN_HEAD="StubIdentityHead",
            ),
        ),
        MINIBOOTSTRAP=RefCfg(
            RPN=RefCfg(
                NUM_CLASSES=RPN_A,
                ITERATIONS=iterations,
                BATCH_SIZE=batch_size,
                NEG_IOU_THRESH=0.3,
                POS_IOU_THRESH=0.7,
                SHUFFLE_NEGATIVES=False,
                FEATURES_DEVICE="cpu",
            )
        ),
        DEMO=RefCfg(INCREMENTAL_TRAIN=False),
    )


def _run_rpn_pair(gt_np):
    """Run the literal RPNModule and harvest_rpn on the same image."""
    mod = load_rpn_harvest_module()
    import sys

    ag_mod = sys.modules["ref_harvest_rpn.anchor_generator"]
    rng = np.random.default_rng(7)
    t = rng.standard_normal((5, 6, 16)).astype(np.float32)
    t_chw = torch.tensor(t.transpose(2, 0, 1))
    images = types.SimpleNamespace(image_sizes=[(RPN_IMG_H, RPN_IMG_W)])
    cfg = _rpn_cfg()
    npick = math.ceil(
        cfg.MINIBOOTSTRAP.RPN.BATCH_SIZE
        * cfg.MINIBOOTSTRAP.RPN.ITERATIONS
        / cfg.NUM_IMAGES
    )

    with legacy_torch(), deterministic_torch_sampling():
        # anchors from the REAL reference generator feed BOTH sides, so this
        # test isolates harvest parity from anchor parity (tests/test_anchors)
        anchors_bl = ag_mod.make_anchor_generator(cfg)(images, t_chw)[0][0]
        anchors_np = anchors_bl.bbox.numpy().copy()
        vis_np = anchors_bl.get_field("visibility").numpy().copy()

        m = mod.RPNModule(cfg, in_channels=16)
        gt_bl = _boxlist(gt_np, (RPN_IMG_W, RPN_IMG_H))
        m.forward(images, [t_chw[None]], gt_bbox=gt_bl)

    ref = {
        "neg": [torch.cat(m.negatives[i]).numpy() for i in range(RPN_A)],
        "pos": [torch.cat(m.positives[i]).numpy() for i in range(RPN_A)],
        "X": torch.cat(m.X).numpy(),
        "Y": torch.cat(m.Y).numpy(),
        "C": torch.cat(m.C).numpy().reshape(-1),
    }

    hcfg = HarvestConfig(
        num_anchor_classes=RPN_A,
        negatives_to_pick=npick,
        rpn_pos_cap=64,
        parity_sampling=True,
    )
    chunk = harvest_rpn(
        jax.random.key(0),
        jnp.asarray(t),
        jnp.asarray(anchors_np),
        jnp.asarray(vis_np),
        jnp.asarray(np.asarray(gt_np, np.float32)),
        jnp.ones((len(gt_np),), bool),
        hcfg,
    )
    return ref, jax.device_get(chunk)


def _check_rpn_parity(gt_np):
    ref, chunk = _run_rpn_pair(gt_np)
    for a in range(RPN_A):
        neg = chunk.neg[a][chunk.neg_valid[a]]
        # negatives: the reference's batch-scatter preserves pick order, so
        # the comparison is exact including ordering
        _assert_same_rows(neg, ref["neg"][a], context=f"rpn neg class {a}")
        pos = chunk.pos[a][chunk.pos_valid[a]]
        # positives/COXY: the reference appends rescue anchors after the
        # >0.7 ones; ours keeps anchor order — compare as sorted rows
        _assert_same_rows(
            _sorted_rows(pos), _sorted_rows(ref["pos"][a]),
            context=f"rpn pos class {a}",
        )
        coxy = np.concatenate(
            [pos, chunk.coxy_y[a][chunk.pos_valid[a]]], axis=1
        )
        sel = ref["C"] == a
        ref_coxy = np.concatenate([ref["X"][sel], ref["Y"][sel]], axis=1)
        _assert_same_rows(
            _sorted_rows(coxy), _sorted_rows(ref_coxy),
            context=f"rpn coxy class {a}",
        )


def test_rpn_harvest_parity_two_gts():
    # coordinates globally distinct (the reference's rescue check compares
    # raw coordinate values across boxes); neither GT matches an anchor
    # exactly, so the GT-rescue path is exercised on both sides
    _check_rpn_parity([[4.0, 6.0, 21.0, 19.0], [25.0, 22.0, 43.0, 34.0]])


def test_rpn_harvest_parity_single_gt():
    # the reference has a dedicated single-GT branch (no torch.max reduce)
    _check_rpn_parity([[9.0, 11.0, 27.0, 26.0]])


def test_rpn_harvest_parity_anchor_aligned_gt():
    # a GT equal to a visible anchor box drives IoU=1 > 0.7: the direct
    # (non-rescue) positive path, plus a second GT through rescue
    mod = load_rpn_harvest_module()
    import sys

    ag_mod = sys.modules["ref_harvest_rpn.anchor_generator"]
    images = types.SimpleNamespace(image_sizes=[(RPN_IMG_H, RPN_IMG_W)])
    t_chw = torch.zeros((16, 5, 6))
    with legacy_torch():
        anchors_bl = ag_mod.make_anchor_generator(_rpn_cfg())(images, t_chw)[0][0]
        anchors = anchors_bl.bbox.numpy()
        vis = anchors_bl.get_field("visibility").numpy()
    aligned = anchors[vis][3]
    _check_rpn_parity([list(aligned), [1.0, 2.0, 14.5, 12.5]])


# --------------------------------------------------------------------------
# Detector harvesting


def _det_cfg(num_classes=4, iterations=2, batch_size=10, num_images=2):
    return RefCfg(
        SAVE_FEATURES_DETECTOR=False,
        NUM_IMAGES=num_images,
        MINIBOOTSTRAP=RefCfg(
            DETECTOR=RefCfg(
                FEATURES_DEVICE="cpu",
                NUM_CLASSES=num_classes,
                ITERATIONS=iterations,
                BATCH_SIZE=batch_size,
                EXTRACT_ONLY_GT_POSITIVES=True,
                SHUFFLE_NEGATIVES=False,
                NEG_IOU_THRESH=0.3,
            )
        ),
        DEMO=RefCfg(INCREMENTAL_TRAIN=False),
        REGRESSORS=RefCfg(MIN_OVERLAP=0.6),
    )


def _run_det_pair(gt_boxes, gt_labels, n_props, img_size=(60, 50), seed=3):
    mod = load_box_head_harvest_module()
    rng = np.random.default_rng(seed)
    g = len(gt_labels)
    # proposals partly out of bounds to exercise the clamp on both sides
    x1 = rng.uniform(-6, img_size[0] - 4, n_props)
    y1 = rng.uniform(-6, img_size[1] - 4, n_props)
    props = np.stack(
        [
            x1,
            y1,
            x1 + rng.uniform(2, img_size[0] * 0.8, n_props),
            y1 + rng.uniform(2, img_size[1] * 0.8, n_props),
        ],
        axis=1,
    ).astype(np.float32)
    boxes = np.concatenate([np.asarray(gt_boxes, np.float32), props], axis=0)
    feats = rng.standard_normal((len(boxes), 32)).astype(np.float32)
    cfg = _det_cfg()
    npick = math.ceil(
        cfg.MINIBOOTSTRAP.DETECTOR.BATCH_SIZE
        * cfg.MINIBOOTSTRAP.DETECTOR.ITERATIONS
        / cfg.NUM_IMAGES
    )

    StubBoxFeatureExtractor.injected = torch.tensor(feats)
    StubBoxFeatureExtractor.out_channels = feats.shape[1]
    with legacy_torch(), deterministic_torch_sampling():
        head = mod.ROIBoxHead(cfg, in_channels=32)
        proposals = [_boxlist(boxes.copy(), img_size)]
        gt_bl = _boxlist(np.asarray(gt_boxes, np.float32).copy(), img_size)
        gt_label = torch.tensor(np.asarray(gt_labels), dtype=torch.uint8).view(-1, 1)
        head.forward_train(
            [None],
            proposals,
            gt_bbox=gt_bl,
            gt_label=gt_label,
            img_size=img_size,
            gt_labels_list=list(gt_labels),
        )
    n_cls = cfg.MINIBOOTSTRAP.DETECTOR.NUM_CLASSES
    ref = {
        "pos": [torch.cat(head.positives[c]).numpy() for c in range(n_cls)],
        "neg": [torch.cat(head.negatives[c]).numpy() for c in range(n_cls)],
        "X": torch.cat(head.X).numpy(),
        "Y": torch.cat(head.Y).numpy(),
        "C": torch.cat(head.C).numpy().reshape(-1),
    }

    hcfg = HarvestConfig(
        num_classes=n_cls,
        negatives_to_pick=npick,
        gt_cap=g,
        coxy_cap=max(64, len(boxes)),
        parity_sampling=True,
    )
    det = harvest_detector(
        jax.random.key(0),
        jnp.asarray(feats),
        jnp.asarray(boxes),
        jnp.ones((len(boxes),), bool),
        jnp.asarray(np.asarray(gt_labels, np.int32)),
        jnp.ones((g,), bool),
        img_size,
        hcfg,
    )
    return ref, jax.device_get(det), feats


def _check_det_parity(gt_boxes, gt_labels, n_props, **kw):
    ref, det, feats = _run_det_pair(gt_boxes, gt_labels, n_props, **kw)
    labels = np.asarray(gt_labels)
    n_cls = len(ref["pos"])
    for c in range(1, n_cls + 1):
        pos = det.pos[det.pos_valid & (labels == c)]
        _assert_same_rows(pos, ref["pos"][c - 1], context=f"det pos class {c}")
        neg = det.neg[c - 1][det.neg_valid[c - 1]]
        _assert_same_rows(neg, ref["neg"][c - 1], context=f"det neg class {c}")
    # COXY: the reference groups rows per GT, ours keeps row order — compare
    # the (features, target, class) triplets as sorted rows
    coxy = np.concatenate(
        [
            det.coxy_x[det.coxy_valid],
            det.coxy_y[det.coxy_valid],
            det.coxy_c[det.coxy_valid][:, None],
        ],
        axis=1,
    )
    ref_coxy = np.concatenate([ref["X"], ref["Y"], ref["C"][:, None]], axis=1)
    _assert_same_rows(_sorted_rows(coxy), _sorted_rows(ref_coxy), context="det coxy")


def test_detector_harvest_parity():
    gt = [[5.0, 7.0, 24.0, 30.0], [33.0, 12.0, 55.0, 41.0], [8.0, 35.0, 28.0, 48.0]]
    _check_det_parity(gt, [1, 2, 2], n_props=40)


def test_detector_harvest_parity_absent_class_pool():
    # only one class present: the other classes sample negatives from ALL
    # rows with replacement (the reference's duplicate-emitting path)
    _check_det_parity([[10.0, 10.0, 40.0, 40.0]], [3], n_props=6)


# --------------------------------------------------------------------------
# Mask harvesting


def test_mask_harvest_parity():
    mod = load_mask_head_harvest_module()
    rng = np.random.default_rng(11)
    g, ch = 3, 16
    labels = [1, 2, 2]
    deconv = np.abs(rng.standard_normal((g, ch, 14, 14))).astype(np.float32)
    masks = (rng.uniform(size=(g, 14, 14)) > 0.55).astype(np.float32)

    StubConv5Mask.injected = torch.tensor(deconv)
    StubConv5Mask.out_channels = ch
    cfg = RefCfg(
        SAVE_FEATURES_DETECTOR=False,
        MODEL=RefCfg(
            ROI_MASK_HEAD=RefCfg(
                SHARE_BOX_FEATURE_EXTRACTOR=True,
                FEATURE_EXTRACTOR="ResNet50Conv5ROIFeatureExtractor",
            )
        ),
        SEGMENTATION=RefCfg(
            FEATURES_DEVICE="cpu", BATCH_SIZE=100000, SAMPLING_FACTOR=0.3
        ),
        MINIBOOTSTRAP=RefCfg(DETECTOR=RefCfg(NUM_CLASSES=4)),
    )
    with legacy_torch(), deterministic_torch_sampling():
        head = mod.ROIMaskHead(cfg, in_channels=ch)
        gt_bl = _boxlist(
            [[2.0, 2.0, 30.0, 30.0], [5.0, 9.0, 28.0, 40.0], [1.0, 3.0, 20.0, 22.0]],
            (48, 48),
        )
        gt_bl.add_field(
            "masks",
            StubSegmentationMasks([torch.tensor(m) for m in masks], (48, 48)),
        )
        head.forward(torch.tensor(deconv), None, labels, gt_bl)
    ref_pos = [torch.cat(head.positives[c]).numpy() for c in range(4)]
    ref_neg = [torch.cat(head.negatives[c]).numpy() for c in range(4)]

    hcfg = HarvestConfig(
        num_classes=4, sampling_factor=0.3, mask_pix_cap=64, parity_sampling=True
    )
    chunk = jax.device_get(
        harvest_mask(
            jax.random.key(0),
            jnp.asarray(deconv.transpose(0, 2, 3, 1)),
            jnp.asarray(masks),
            jnp.asarray(np.asarray(labels, np.int32)),
            jnp.ones((g,), bool),
            hcfg,
        )
    )
    for c in range(1, 5):
        rows_pos = [
            chunk.pos[i][chunk.pos_valid[i]] for i in range(g) if labels[i] == c
        ]
        got_pos = (
            np.concatenate(rows_pos, axis=0) if rows_pos else np.zeros((0, ch))
        )
        # reference appends per-GT in GT order, picks in the pinned-randperm
        # order — ours matches exactly including ordering
        _assert_same_rows(got_pos, ref_pos[c - 1], context=f"mask pos class {c}")
        rows_neg = [
            chunk.neg[i][chunk.neg_valid[i]] for i in range(g) if labels[i] == c
        ]
        got_neg = (
            np.concatenate(rows_neg, axis=0) if rows_neg else np.zeros((0, ch))
        )
        _assert_same_rows(got_neg, ref_neg[c - 1], context=f"mask neg class {c}")


# --------------------------------------------------------------------------
# Average recall


def test_average_recall_parity():
    mod = load_average_recall_module()
    rng = np.random.default_rng(5)
    gt = np.array(
        [[4.0, 6.0, 30.0, 28.0], [40.0, 35.0, 70.0, 66.0]], dtype=np.float32
    )
    x1 = rng.uniform(0, 70, 25)
    y1 = rng.uniform(0, 60, 25)
    props = np.stack(
        [x1, y1, x1 + rng.uniform(3, 40, 25), y1 + rng.uniform(3, 40, 25)], axis=1
    ).astype(np.float32)
    with legacy_torch():
        want = mod.compute_average_recall(
            _boxlist(gt, (100, 100)), _boxlist(props, (100, 100))
        )
    got = float(
        average_recall(
            jnp.asarray(gt),
            jnp.ones((len(gt),), bool),
            jnp.asarray(props),
            jnp.ones((len(props),), bool),
        )
    )
    assert abs(got - want) < 1e-5
