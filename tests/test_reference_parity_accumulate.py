"""Differential parity of MULTI-IMAGE reservoir accumulation vs the literal
reference harvesting heads.

The single-image harvest parity suite (tests/test_reference_parity_harvest.py)
pins per-image sampling; this file extends the comparison across an image
STREAM, where the reference's stateful batch-scatter bookkeeping lives:

- ``rpn_getProposals.py:283-340`` — SHUFFLE_NEGATIVES=False round-robin
  filling with ``still_to_complete`` / ``current_batch`` per-class cursors and
  the configured ``negatives_to_pick`` stride (``:296``);
- ``box_head_getProposals.py:228-270`` — same for the detector head;
- ``extract_features_rpn_detector.py:320-346`` — SHUFFLE_NEGATIVES=True
  flush-time randperm re-batching into ITERATIONS batches (transcribed inline
  below under a pinned permutation; the literal method is welded to
  maskrcnn_benchmark checkpoint/dataloader machinery);
- ``mask_head_getProposals.py:118-138`` — mask pools append-and-roll-over.

Our side folds per-image ``harvest_*`` chunks through ``HarvestAccumulator``
and compares ``finalize_head`` output batch-by-batch.

Known intentional deviation (mask pools only): the reference rolls a batch
AFTER concatenation when it reaches BATCH_SIZE, so a stored batch can exceed
BATCH_SIZE by up to one image's contribution; ours caps batches at exactly
BATCH_SIZE. Batch *boundaries* therefore differ while the per-class
concatenation (what training consumes — the experiment drivers re-concatenate
segmentation batches, ``run_experiment_online_rpn_ood_oos.py:252-254``) is
compared exactly, including order.
"""

import math
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import (
    HarvestConfig,
    harvest_detector,
    harvest_mask,
    harvest_rpn,
)
from tests.ref_shims import (
    RefCfg,
    StubBoxFeatureExtractor,
    StubConv5Mask,
    StubSegmentationMasks,
    deterministic_torch_sampling,
    legacy_torch,
    load_box_head_harvest_module,
    load_mask_head_harvest_module,
    load_rpn_harvest_module,
)
from tests.test_reference_parity_harvest import (
    RPN_A,
    RPN_IMG_H,
    RPN_IMG_W,
    _boxlist,
    _det_cfg,
    _rpn_cfg,
    _sorted_rows,
)

pytestmark = pytest.mark.fast


def _assert_rows(got, want, context):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    assert got.shape == want.shape, f"{context}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5, err_msg=context)


def _reversal_rng():
    """np-facing stand-in matching the pinned torch.randperm (reversal)."""
    return types.SimpleNamespace(
        permutation=lambda n: np.arange(int(n) - 1, -1, -1)
    )


# --------------------------------------------------------------------------
# RPN stream


def _rpn_stream(n_images, seed=7):
    """Per-image (features_hwc, gts) with varying GT counts."""
    rng = np.random.default_rng(seed)
    feats = [
        rng.standard_normal((5, 6, 16)).astype(np.float32)
        for _ in range(n_images)
    ]
    gts = [
        [[4.0, 6.0, 21.0, 19.0], [25.0, 22.0, 43.0, 34.0]],
        [[9.0, 11.0, 27.0, 26.0]],
        [[2.0, 3.0, 17.0, 30.0], [20.0, 5.0, 44.0, 21.0]],
    ][:n_images]
    return feats, gts


def _run_rpn_stream(cfg, feats, gts):
    """Drive ONE stateful reference RPNModule over the stream."""
    mod = load_rpn_harvest_module()
    import sys

    ag_mod = sys.modules["ref_harvest_rpn.anchor_generator"]
    images = types.SimpleNamespace(image_sizes=[(RPN_IMG_H, RPN_IMG_W)])
    with legacy_torch(), deterministic_torch_sampling():
        t0 = torch.tensor(feats[0].transpose(2, 0, 1))
        anchors_bl = ag_mod.make_anchor_generator(cfg)(images, t0)[0][0]
        anchors_np = anchors_bl.bbox.numpy().copy()
        vis_np = anchors_bl.get_field("visibility").numpy().copy()
        m = mod.RPNModule(cfg, in_channels=16)
        for t, gt in zip(feats, gts):
            t_chw = torch.tensor(np.asarray(t).transpose(2, 0, 1))
            m.forward(
                images, [t_chw[None]],
                gt_bbox=_boxlist(gt, (RPN_IMG_W, RPN_IMG_H)),
            )
    return m, anchors_np, vis_np


def _our_rpn_chunks(feats, gts, anchors_np, vis_np, npick):
    hcfg = HarvestConfig(
        num_anchor_classes=RPN_A,
        negatives_to_pick=npick,
        rpn_pos_cap=64,
        parity_sampling=True,
    )
    chunks = []
    for t, gt in zip(feats, gts):
        chunks.append(
            jax.device_get(
                harvest_rpn(
                    jax.random.key(0),
                    jnp.asarray(t),
                    jnp.asarray(anchors_np),
                    jnp.asarray(vis_np),
                    jnp.asarray(np.asarray(gt, np.float32)),
                    jnp.ones((len(gt),), bool),
                    hcfg,
                )
            )
        )
    return chunks


@pytest.mark.parametrize(
    "iterations,batch_size",
    [
        # npick = ceil(40*2/3) = 27 >> the ~8-row per-image pools: underfill,
        # where the reference's per-batch stride still uses the CONFIGURED
        # npick (everything lands in batch 0)
        (2, 40),
        # npick = 6 vs ~8-row pools: batches FILL mid-stream — exercises the
        # skip-full-batch cursor, still_to_complete saturation and
        # end-of-stream drops
        (2, 8),
    ],
)
def test_rpn_stream_round_robin_parity(iterations, batch_size):
    n_images = 3
    cfg = _rpn_cfg(iterations=iterations, batch_size=batch_size, num_images=n_images)
    npick = math.ceil(batch_size * iterations / n_images)
    feats, gts = _rpn_stream(n_images)
    m, anchors_np, vis_np = _run_rpn_stream(cfg, feats, gts)

    acc = HarvestAccumulator(RPN_A, 1, rpn_dim=16)
    for c in _our_rpn_chunks(feats, gts, anchors_np, vis_np, npick):
        acc._add_rpn(c)
    out = acc.finalize_head(
        acc.rpn_pools, 16, iterations, batch_size,
        shuffle=False, negatives_to_pick=npick,
    )

    for a in range(RPN_A):
        for b in range(iterations):
            want = m.negatives[a][b].numpy()
            got = out["neg"][a, b][out["neg_valid"][a, b]]
            # exact including order: the round-robin scatter is deterministic
            _assert_rows(got, want, f"rpn stream neg class {a} batch {b}")
        want_pos = torch.cat(m.positives[a]).numpy()
        got_pos = out["pos"][a][out["pos_valid"][a]]
        _assert_rows(
            _sorted_rows(got_pos), _sorted_rows(want_pos),
            f"rpn stream pos class {a}",
        )
    # COXY concatenated across the stream
    coxy = acc._coxy(acc.rpn_coxy, 16)
    ref_x = torch.cat(m.X).numpy()
    ref_y = torch.cat(m.Y).numpy()
    ref_c = torch.cat(m.C).numpy().reshape(-1)
    _assert_rows(
        _sorted_rows(np.concatenate([coxy["X"], coxy["Y"], coxy["C"][:, None]], 1)),
        _sorted_rows(np.concatenate([ref_x, ref_y, ref_c[:, None]], 1)),
        "rpn stream coxy",
    )


def test_rpn_stream_shuffle_flush_parity():
    # SHUFFLE_NEGATIVES=True: harvest appends arrival-order (with roll-over),
    # flush concatenates, permutes and re-batches into ITERATIONS batches —
    # transcription of extract_features_rpn_detector.py:320-328 under the
    # pinned (reversal) permutation on both sides
    iterations, batch_size, n_images = 2, 30, 3
    cfg = _rpn_cfg(iterations=iterations, batch_size=batch_size, num_images=n_images)
    cfg.MINIBOOTSTRAP.RPN.SHUFFLE_NEGATIVES = True
    npick = math.ceil(batch_size * iterations / n_images)
    feats, gts = _rpn_stream(n_images)
    m, anchors_np, vis_np = _run_rpn_stream(cfg, feats, gts)

    ref_batches = []
    with deterministic_torch_sampling():
        for i in range(RPN_A):
            total = torch.cat(m.negatives[i])
            ids = torch.randperm(len(total))
            per_cls = []
            for j in range(iterations):
                lo = min(j * batch_size, len(ids))
                hi = min((j + 1) * batch_size, len(ids))
                per_cls.append(total[ids[lo:hi]].numpy())
            ref_batches.append(per_cls)

    acc = HarvestAccumulator(RPN_A, 1, rpn_dim=16)
    acc.rng = _reversal_rng()
    for c in _our_rpn_chunks(feats, gts, anchors_np, vis_np, npick):
        acc._add_rpn(c)
    out = acc.finalize_head(acc.rpn_pools, 16, iterations, batch_size, shuffle=True)

    for a in range(RPN_A):
        for b in range(iterations):
            got = out["neg"][a, b][out["neg_valid"][a, b]]
            _assert_rows(
                got, ref_batches[a][b], f"rpn shuffle neg class {a} batch {b}"
            )


# --------------------------------------------------------------------------
# Detector stream


def test_detector_stream_round_robin_parity():
    mod = load_box_head_harvest_module()
    iterations, batch_size, n_images = 2, 16, 3
    n_cls = 4
    cfg = _det_cfg(
        num_classes=n_cls, iterations=iterations, batch_size=batch_size,
        num_images=n_images,
    )
    npick = math.ceil(batch_size * iterations / n_images)
    img_size = (60, 50)
    rng = np.random.default_rng(3)

    # per-image (gt_boxes, labels, n_props): class 4 is absent everywhere
    # (pure random-negative pool); classes 1-3 flip presence across images
    stream = [
        ([[5.0, 7.0, 24.0, 30.0], [33.0, 12.0, 55.0, 41.0]], [1, 2], 12),
        ([[8.0, 35.0, 28.0, 48.0]], [3], 9),
        ([[10.0, 10.0, 40.0, 40.0], [20.0, 18.0, 45.0, 44.0]], [2, 1], 14),
    ]

    def make_image(gt_boxes, n_props):
        x1 = rng.uniform(-6, img_size[0] - 4, n_props)
        y1 = rng.uniform(-6, img_size[1] - 4, n_props)
        props = np.stack(
            [x1, y1, x1 + rng.uniform(2, img_size[0] * 0.8, n_props),
             y1 + rng.uniform(2, img_size[1] * 0.8, n_props)], axis=1
        ).astype(np.float32)
        boxes = np.concatenate([np.asarray(gt_boxes, np.float32), props], 0)
        feats = rng.standard_normal((len(boxes), 32)).astype(np.float32)
        return boxes, feats

    images = [make_image(gt, n) for gt, _, n in [(s[0], s[1], s[2]) for s in stream]]

    with legacy_torch(), deterministic_torch_sampling():
        StubBoxFeatureExtractor.out_channels = 32
        head = mod.ROIBoxHead(cfg, in_channels=32)
        for (gt_boxes, labels, _), (boxes, feats) in zip(stream, images):
            StubBoxFeatureExtractor.injected = torch.tensor(feats)
            head.forward_train(
                [None],
                [_boxlist(boxes.copy(), img_size)],
                gt_bbox=_boxlist(np.asarray(gt_boxes, np.float32).copy(), img_size),
                gt_label=torch.tensor(np.asarray(labels), dtype=torch.uint8).view(-1, 1),
                img_size=img_size,
                gt_labels_list=list(labels),
            )

    acc = HarvestAccumulator(1, n_cls, det_dim=32)
    for (gt_boxes, labels, _), (boxes, feats) in zip(stream, images):
        g = len(labels)
        hcfg = HarvestConfig(
            num_classes=n_cls,
            negatives_to_pick=npick,
            gt_cap=g,
            coxy_cap=max(64, len(boxes)),
            parity_sampling=True,
        )
        det = jax.device_get(
            harvest_detector(
                jax.random.key(0),
                jnp.asarray(feats),
                jnp.asarray(boxes),
                jnp.ones((len(boxes),), bool),
                jnp.asarray(np.asarray(labels, np.int32)),
                jnp.ones((g,), bool),
                img_size,
                hcfg,
            )
        )
        acc._add_det(det)

    out = acc.finalize_head(
        acc.det_pools, 32, iterations, batch_size,
        shuffle=False, negatives_to_pick=npick,
    )
    for c in range(n_cls):
        for b in range(iterations):
            want = head.negatives[c][b].numpy()
            got = out["neg"][c, b][out["neg_valid"][c, b]]
            _assert_rows(got, want, f"det stream neg class {c + 1} batch {b}")
        want_pos = torch.cat(head.positives[c]).numpy()
        got_pos = out["pos"][c][out["pos_valid"][c]]
        _assert_rows(got_pos, want_pos, f"det stream pos class {c + 1}")
    # COXY across the stream
    coxy = acc._coxy(acc.det_coxy, 32)
    ref = np.concatenate(
        [torch.cat(head.X).numpy(), torch.cat(head.Y).numpy(),
         torch.cat(head.C).numpy().reshape(-1, 1)], axis=1
    )
    got = np.concatenate([coxy["X"], coxy["Y"], coxy["C"][:, None]], axis=1)
    _assert_rows(_sorted_rows(got), _sorted_rows(ref), "det stream coxy")


# --------------------------------------------------------------------------
# Mask stream


def test_mask_stream_concat_parity():
    mod = load_mask_head_harvest_module()
    rng = np.random.default_rng(11)
    ch, n_cls = 16, 3
    # batch_size 40 << per-image pixel yield (~0.3*196 rows/GT): the
    # reference's append-and-roll-over path runs mid-stream
    batch_size = 40
    cfg = RefCfg(
        SAVE_FEATURES_DETECTOR=False,
        MODEL=RefCfg(
            ROI_MASK_HEAD=RefCfg(
                SHARE_BOX_FEATURE_EXTRACTOR=True,
                FEATURE_EXTRACTOR="ResNet50Conv5ROIFeatureExtractor",
            )
        ),
        SEGMENTATION=RefCfg(
            FEATURES_DEVICE="cpu", BATCH_SIZE=batch_size, SAMPLING_FACTOR=0.3
        ),
        MINIBOOTSTRAP=RefCfg(DETECTOR=RefCfg(NUM_CLASSES=n_cls)),
    )
    stream = [
        ([1, 2], [[2.0, 2.0, 30.0, 30.0], [5.0, 9.0, 28.0, 40.0]]),
        ([2], [[1.0, 3.0, 20.0, 22.0]]),
        ([3, 1], [[4.0, 8.0, 33.0, 36.0], [6.0, 2.0, 25.0, 27.0]]),
    ]
    deconvs = [
        np.abs(rng.standard_normal((len(lbls), ch, 14, 14))).astype(np.float32)
        for lbls, _ in stream
    ]
    masks = [
        (rng.uniform(size=(len(lbls), 14, 14)) > 0.55).astype(np.float32)
        for lbls, _ in stream
    ]

    with legacy_torch(), deterministic_torch_sampling():
        StubConv5Mask.out_channels = ch
        head = mod.ROIMaskHead(cfg, in_channels=ch)
        for (labels, gt_boxes), dc, mk in zip(stream, deconvs, masks):
            StubConv5Mask.injected = torch.tensor(dc)
            gt_bl = _boxlist(gt_boxes, (48, 48))
            gt_bl.add_field(
                "masks",
                StubSegmentationMasks([torch.tensor(m) for m in mk], (48, 48)),
            )
            head.forward(torch.tensor(dc), None, list(labels), gt_bl)
    # flush = per-class concat (extract_features_rpn_detector.py:348-353)
    ref_pos = [torch.cat(head.positives[c]).numpy() for c in range(n_cls)]
    ref_neg = [torch.cat(head.negatives[c]).numpy() for c in range(n_cls)]

    acc = HarvestAccumulator(1, n_cls, mask_dim=ch)
    for (labels, _), dc, mk in zip(stream, deconvs, masks):
        g = len(labels)
        hcfg = HarvestConfig(
            num_classes=n_cls, sampling_factor=0.3, mask_pix_cap=64,
            parity_sampling=True,
        )
        chunk = jax.device_get(
            harvest_mask(
                jax.random.key(0),
                jnp.asarray(dc.transpose(0, 2, 3, 1)),
                jnp.asarray(mk),
                jnp.asarray(np.asarray(labels, np.int32)),
                jnp.ones((g,), bool),
                hcfg,
            )
        )
        acc._add_mask(chunk)

    seg_iters = max(
        math.ceil(max(len(p) for p in ref_pos + ref_neg) / batch_size), 1
    )
    out = acc.finalize_head(
        acc.mask_pools, ch, seg_iters, batch_size,
        shuffle=False, arrival_order=True,
    )
    for c in range(n_cls):
        got_pos = np.concatenate(
            [out["pos"][c][out["pos_valid"][c]]], axis=0
        )
        _assert_rows(got_pos, ref_pos[c], f"mask stream pos class {c + 1}")
        got_neg = np.concatenate(
            [out["neg"][c, b][out["neg_valid"][c, b]] for b in range(seg_iters)],
            axis=0,
        )
        # exact including order: arrival-order concat on both sides
        _assert_rows(got_neg, ref_neg[c], f"mask stream neg class {c + 1}")
