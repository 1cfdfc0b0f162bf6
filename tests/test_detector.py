"""End-to-end detector assembly test with random weights + random on-line
models (shape/validity invariants on a small canvas)."""

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.models.anchors import grid_anchors
from online_detection_tpu.models.detector import (
    DetectorConfig,
    OnlineModelSet,
    detect,
    init_detector_params,
)
from online_detection_tpu.models.heads import OnlineDetectorModels, OnlineMaskModels
from online_detection_tpu.models.rpn import OnlineRPNModels
from online_detection_tpu.solvers.falkon import FalkonModel
from online_detection_tpu.solvers.rls import RLSModel
from online_detection_tpu.utils.stats import FeatureStats


def random_falkon(rng, c, m, d, sigma):
    return FalkonModel(
        centers=jnp.asarray(rng.normal(size=(c, m, d)).astype(np.float32)),
        alpha=jnp.asarray(rng.normal(size=(c, m)).astype(np.float32) * 0.01),
        exists=jnp.ones((c,), bool),
        sigma=sigma,
    )


def random_rls(rng, c, d):
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (c, 4, 4)).copy()
    return RLSModel(
        beta=jnp.asarray(rng.normal(size=(c, d + 1, 4)).astype(np.float32) * 1e-4),
        t_inv=jnp.asarray(eye4),
        t=jnp.asarray(eye4),
        mu=jnp.zeros((c, 4)),
        exists=jnp.ones((c,), bool),
        mean_losses=jnp.zeros((c, 4)),
    )


def random_stats(rng, d):
    return FeatureStats(
        mean=jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.1),
        std=jnp.ones((d,)),
        mean_norm=jnp.asarray(20.0),
    )


def build_online(rng, n_classes=3, n_anchors=15, m=16):
    rpn = OnlineRPNModels(
        falkon=random_falkon(rng, n_anchors, m, 1024, 50.0),
        rls=random_rls(rng, n_anchors, 1024),
        stats=random_stats(rng, 1024),
    )
    det = OnlineDetectorModels(
        falkon=random_falkon(rng, n_classes, m, 2048, 15.0),
        rls=random_rls(rng, n_classes, 2048),
        stats=random_stats(rng, 2048),
    )
    mask = OnlineMaskModels(
        falkon=random_falkon(rng, n_classes, m, 256, 10.0),
        stats=random_stats(rng, 256),
    )
    return OnlineModelSet(rpn=rpn, detector=det, mask=mask)


def test_detect_end_to_end_shapes(rng):
    h, w = 128, 160
    params = init_detector_params(jax.random.key(0), 15, 4)
    online = build_online(rng)
    anchors = jnp.asarray(grid_anchors(h // 16, w // 16))
    image = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
    cfg = DetectorConfig(pre_nms_top_n=200, post_nms_top_n=50, detections_per_img=20)

    dets, masks, props, pvalid = detect(
        params, online, anchors, image, jnp.asarray([w, h]), cfg
    )
    assert props.shape == (50, 4) and pvalid.shape == (50,)
    assert dets.boxes.shape == (20, 4)
    assert masks.shape == (20, 14, 14)
    # valid detections have labels in [1, C] and boxes inside the image
    v = np.asarray(dets.valid)
    if v.any():
        labels = np.asarray(dets.labels)[v]
        assert ((labels >= 1) & (labels <= 3)).all()
        b = np.asarray(dets.boxes)[v]
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= w - 1 + 1e-3).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= h - 1 + 1e-3).all()
        m = np.asarray(masks)[v]
        assert ((m >= 0) & (m <= 1)).all()
    # padding rows zeroed
    assert (np.asarray(dets.boxes)[~v] == 0).all()


def test_detect_pretrained_rpn_path(rng):
    """online.rpn=None -> pretrained conv logits propose instead."""
    h, w = 128, 160
    params = init_detector_params(jax.random.key(1), 15, 4)
    online = build_online(rng)._replace(rpn=None, mask=None)
    anchors = jnp.asarray(grid_anchors(h // 16, w // 16))
    image = jnp.asarray(rng.normal(size=(h, w, 3)).astype(np.float32))
    cfg = DetectorConfig(pre_nms_top_n=100, post_nms_top_n=30, detections_per_img=10)
    dets, masks, props, pvalid = detect(
        params, online, anchors, image, jnp.asarray([w, h]), cfg, with_masks=False
    )
    assert masks is None
    assert dets.boxes.shape == (10, 4)
    assert bool(pvalid.any())


def test_detect_batched_matches_vmap_detect(rng):
    """detect_batched (rowwise head stages flattened across the image batch —
    the production inference program) is semantically jax.vmap(detect)."""
    from online_detection_tpu.models.detector import detect_batched

    h, w, b = 96, 128, 3
    params = init_detector_params(jax.random.key(2), 15, 4)
    online = build_online(rng)
    anchors = jnp.asarray(grid_anchors(h // 16, w // 16))
    images = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32) * 40)
    sizes = jnp.asarray([[w, h], [w - 10, h - 6], [w, h - 16]], jnp.float32)
    cfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40,
                         detections_per_img=12)

    want = jax.vmap(
        lambda im, sz: detect(params, online, anchors, im, sz, cfg, True)
    )(images, sizes)
    got = detect_batched(params, online, anchors, images, sizes, cfg, True)

    for g, x in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_detect_batched_gt_mode_matches_vmap(rng):
    """GT-substitution (--eval_segm_with_gt_bboxes) parity with vmap(detect)."""
    from online_detection_tpu.models.detector import detect_batched

    h, w, b, k = 96, 128, 2, 4
    params = init_detector_params(jax.random.key(3), 15, 4)
    online = build_online(rng)
    anchors = jnp.asarray(grid_anchors(h // 16, w // 16))
    images = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32) * 40)
    sizes = jnp.asarray([[w, h], [w, h]], jnp.float32)
    gb = jnp.asarray(rng.uniform(0, 60, size=(b, k, 4)).astype(np.float32))
    gb = gb.at[..., 2:].add(20.0)
    gl = jnp.asarray(rng.integers(1, 4, size=(b, k)).astype(np.int32))
    gv = jnp.asarray([[True, True, False, True], [True, False, True, False]])
    cfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40,
                         detections_per_img=k)

    want = jax.vmap(
        lambda im, sz, b_, l_, v_: detect(
            params, online, anchors, im, sz, cfg, True,
            gt_boxes=b_, gt_labels=l_, gt_valid=v_,
        )
    )(images, sizes, gb, gl, gv)
    got = detect_batched(params, online, anchors, images, sizes, cfg, True,
                         gt_boxes=gb, gt_labels=gl, gt_valid=gv)
    for g, x in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_mask_predict_labels_equals_selected_full_sweep(rng):
    """The own-class fast path == select_mask_channel over the all-class
    sweep (the algebraic contract that lets detect() skip 20/21 of the mask
    kernel FLOPs), including background labels and missing classes."""
    from online_detection_tpu.models.heads import (
        OnlineMaskModels,
        mask_predict,
        mask_predict_labels,
    )
    from online_detection_tpu.models.postprocess import select_mask_channel

    falkon = random_falkon(rng, 4, 8, 256, 10.0)
    from online_detection_tpu.solvers.falkon import FalkonModel as FM
    falkon = FM(falkon.centers, falkon.alpha,
                jnp.asarray([True, True, False, True]), falkon.sigma)
    models = OnlineMaskModels(falkon=falkon, stats=random_stats(rng, 256))
    feats = jnp.asarray(rng.normal(size=(7, 14, 14, 256)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3, 4, 1, 3], jnp.int32)  # 0=bg, 3=missing
    full = select_mask_channel(mask_predict(models, feats), labels)
    fast = mask_predict_labels(models, feats, labels)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full),
                               atol=2e-6, rtol=1e-5)
    # chunked path (roi_chunk < R) is identical
    fast_chunked = mask_predict_labels(models, feats, labels, roi_chunk=3)
    np.testing.assert_allclose(np.asarray(fast_chunked), np.asarray(full),
                               atol=2e-6, rtol=1e-5)
