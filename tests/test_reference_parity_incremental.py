"""Differential parity of the INCREMENTAL-TEACHING hooks vs the literal
reference.

The reference grows its on-line class set mid-stream through
``ROIBoxHead.add_new_class`` (``box_head_getProposals.py:90-99``): the new
class gets empty minibootstrap slots and fills them ONLY from images observed
AFTER the add, via the ``still_to_complete`` round-robin bookkeeping
(``box_head_getProposals.py:228-265``); pre-add classes keep accumulating
across the add. This file drives the LITERAL head (loaded from the reference
checkout, CPU torch, pinned sampling) through an observation stream with an
``add_new_class`` in the middle, and the production ``harvest_detector`` +
``HarvestAccumulator`` through the same stream with the class count of the
moment — asserting:

- per-class positive/negative minibootstrap buffers agree bitwise, batch by
  batch, INCLUDING the added class (whose pools must contain only post-add
  rows on both sides);
- post-update detections agree: FALKON classifiers trained from the two
  sides' buffers — literal ``OnlineRegionClassifier.trainRegionClassifier``
  vs the production ``modules.facades.OnlineRegionClassifier`` — score a
  shared probe set identically (same solver backend on both sides; the
  parity boundary documented in README.md applies).

Known intentional deviation (documented in ``modules/demo.py``): the
user-facing ``IncrementalTeacher.update_model`` RE-HARVESTS all stored
observations at the current class count, so a class added mid-stream also
mines negatives from pre-add observations (more data, not less — a live
reference robot cannot revisit past frames, a stored-observation teacher
can). The hook-level contract asserted here is the reference's exact
semantics, driven through the same production harvest/accumulate functions
the teacher composes.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import HarvestConfig, harvest_detector
from tests.ref_shims import (
    StubBoxFeatureExtractor,
    deterministic_torch_sampling,
    legacy_torch,
    load_box_head_harvest_module,
    load_reference_module,
)
import yaml

from tests.test_reference_parity_e2e import (
    _FrameworkFalkonAdapter,
    STATS_INDEX_FN,
)
from tests.test_reference_parity_harvest import _boxlist, _det_cfg

pytestmark = pytest.mark.fast

D = 16
IMG_SIZE = (60, 50)  # (w, h)
N_CLS0 = 2  # classes taught before the add
N_CLS1 = 3  # after add_new_class
ITERATIONS = 2
BATCH_SIZE = 16
N_IMAGES = 4
NPICK = math.ceil(BATCH_SIZE * ITERATIONS / N_IMAGES)


def _write_cfg_yaml(tmp_path):
    """Post-add configuration: the grown (3-foreground-class) class set."""
    cfg = {
        "NUM_CLASSES": N_CLS1 + 1,
        "CHOSEN_CLASSES": ["__background__", "clsA", "clsB", "clsNew"],
        "ONLINE_REGION_CLASSIFIER": {
            "CLASSIFIER": {"lambda": 1e-3, "sigma": 15.0, "M": 64},
            "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
        },
        "REGION_REFINER": {"opts": {"lambda": 1000.0}},
        "EVALUATION": {
            "SCORE_THRESH": -2.0, "NMS": 0.3, "DETECTIONS_PER_IMAGE": 100,
        },
    }
    path = tmp_path / "cfg_incremental.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _make_stream(seed=11):
    """Four observations: two pre-add (classes 1/2), two post-add (the new
    class 3 appears, class 2 recurs so pre-add classes keep accumulating)."""
    rng = np.random.default_rng(seed)

    def rand_box():
        x1 = rng.uniform(2, IMG_SIZE[0] - 16)
        y1 = rng.uniform(2, IMG_SIZE[1] - 16)
        return np.array(
            [x1, y1, x1 + rng.uniform(8, 20), y1 + rng.uniform(8, 14)],
            np.float32,
        )

    def make_image(gt_labels, n_props):
        gt_boxes = np.stack([rand_box() for _ in gt_labels])
        props = np.stack([rand_box() for _ in range(n_props)])
        # a few proposals hugging each GT so COXY rows exist
        hug = np.stack(
            [g + rng.normal(0, 1.0, 4).astype(np.float32) for g in gt_boxes]
        )
        boxes = np.concatenate([gt_boxes, hug, props]).astype(np.float32)
        feats = rng.standard_normal((len(boxes), D)).astype(np.float32)
        return {
            "gt_boxes": gt_boxes,
            "gt_labels": np.asarray(gt_labels, np.int64),
            "boxes": boxes,
            "feats": feats,
        }

    pre = [make_image([1, 2], 10), make_image([1], 9)]
    post = [make_image([3], 11), make_image([2, 3], 8)]
    probe = rng.standard_normal((13, D)).astype(np.float32)
    return pre, post, probe


def _feed(head, img):
    StubBoxFeatureExtractor.injected = torch.tensor(img["feats"])
    head.forward_train(
        [None],
        [_boxlist(img["boxes"].copy(), IMG_SIZE)],
        gt_bbox=_boxlist(img["gt_boxes"].copy(), IMG_SIZE),
        gt_label=torch.tensor(img["gt_labels"], dtype=torch.uint8).view(-1, 1),
        img_size=IMG_SIZE,
        gt_labels_list=list(img["gt_labels"]),
    )


def _run_reference_stream(pre, post):
    mod = load_box_head_harvest_module()
    cfg = _det_cfg(
        num_classes=N_CLS0, iterations=ITERATIONS, batch_size=BATCH_SIZE,
        num_images=N_IMAGES,
    )
    with legacy_torch(), deterministic_torch_sampling():
        StubBoxFeatureExtractor.out_channels = D
        head = mod.ROIBoxHead(cfg, in_channels=D)
        for img in pre:
            _feed(head, img)
        head.add_new_class()  # box_head_getProposals.py:90-99
        assert head.num_classes == N_CLS1
        for img in post:
            _feed(head, img)
    return head


def _run_framework_stream(pre, post):
    """The same stream through the production per-image harvest: images are
    harvested at the class count of the moment (the not-yet-added class's
    chunk rows masked invalid pre-add — per-class sampling is independent,
    so masking one class cannot perturb another's picks)."""
    acc = HarvestAccumulator(1, N_CLS1, det_dim=D)
    for when, imgs in (("pre", pre), ("post", post)):
        for img in imgs:
            g = len(img["gt_labels"])
            hcfg = HarvestConfig(
                num_classes=N_CLS1,
                negatives_to_pick=NPICK,
                gt_cap=g,
                coxy_cap=max(64, len(img["boxes"])),
                parity_sampling=True,
            )
            det = jax.device_get(
                harvest_detector(
                    jax.random.key(0),
                    jnp.asarray(img["feats"]),
                    jnp.asarray(img["boxes"]),
                    jnp.ones((len(img["boxes"]),), bool),
                    jnp.asarray(img["gt_labels"].astype(np.int32)),
                    jnp.ones((g,), bool),
                    IMG_SIZE,
                    hcfg,
                )
            )
            if when == "pre":
                nv = np.asarray(det.neg_valid).copy()
                nv[N_CLS1 - 1] = False  # class 3 does not exist yet
                det = det._replace(neg_valid=nv)
            acc._add_det(det)
    return acc.finalize_head(
        acc.det_pools, D, ITERATIONS, BATCH_SIZE,
        shuffle=False, negatives_to_pick=NPICK,
    )


def _buffers(head, out):
    ref_pos = [torch.cat(head.positives[c]).numpy() for c in range(N_CLS1)]
    ref_neg = [
        [head.negatives[c][b].numpy() for b in range(ITERATIONS)]
        for c in range(N_CLS1)
    ]
    my_pos = [out["pos"][c][out["pos_valid"][c]] for c in range(N_CLS1)]
    my_neg = [
        [out["neg"][c, b][out["neg_valid"][c, b]] for b in range(ITERATIONS)]
        for c in range(N_CLS1)
    ]
    return ref_pos, ref_neg, my_pos, my_neg


@pytest.fixture(scope="module")
def streams():
    pre, post, probe = _make_stream()
    head = _run_reference_stream(pre, post)
    out = _run_framework_stream(pre, post)
    return pre, post, probe, head, out


def test_add_new_class_stream_buffers_parity(streams):
    pre, post, _, head, out = streams
    ref_pos, ref_neg, my_pos, my_neg = _buffers(head, out)

    for c in range(N_CLS1):
        np.testing.assert_allclose(
            my_pos[c], ref_pos[c], atol=1e-6,
            err_msg=f"incremental pos class {c + 1}",
        )
        for b in range(ITERATIONS):
            np.testing.assert_allclose(
                my_neg[c][b], ref_neg[c][b], atol=1e-6,
                err_msg=f"incremental neg class {c + 1} batch {b}",
            )

    # the incremental semantics themselves must be non-trivial in this world:
    # the added class's pools contain ONLY post-add rows on BOTH sides
    post_rows = np.concatenate([img["feats"] for img in post])
    new_cls_rows = np.concatenate(
        [ref_pos[N_CLS1 - 1]] + ref_neg[N_CLS1 - 1]
    )
    assert len(new_cls_rows) > 0
    pre_rows = np.concatenate([img["feats"] for img in pre])
    for row in new_cls_rows:
        assert (np.abs(post_rows - row).max(axis=1) < 1e-7).any()
        assert not (np.abs(pre_rows - row).max(axis=1) < 1e-7).any()
    # while a pre-add class DID keep accumulating across the add
    cls2_rows = np.concatenate(ref_neg[1])
    assert (
        np.abs(cls2_rows[:, None] - post_rows[None]).max(axis=2) < 1e-7
    ).any(axis=1).any()


def test_post_update_detections_parity(tmp_path, streams):
    """Train FALKON classifiers from both sides' (identical) stream buffers
    through the literal vs production orchestration; the post-update
    detection scores on a shared probe set must agree."""
    pre, post, probe, head, out = streams
    ref_pos, ref_neg, my_pos, my_neg = _buffers(head, out)
    cfg_path = _write_cfg_yaml(tmp_path)

    classifier_mod = load_reference_module(
        "src/modules/region-classifier/OnlineRegionClassifier.py",
        "ref_online_region_classifier",
        ("src/modules/region-classifier", "src/modules", "src"),
    )
    utils_mod = load_reference_module(
        "src/py_od_utils.py", "ref_py_od_utils", ("src",)
    )
    ref_pos_t = [torch.from_numpy(p) for p in ref_pos]
    ref_neg_t = [
        [torch.from_numpy(b) for b in nb if len(b)] for nb in ref_neg
    ]
    with legacy_torch(), deterministic_torch_sampling(STATS_INDEX_FN):
        stats = utils_mod.computeFeatStatistics_torch(
            ref_pos_t, ref_neg_t, num_samples=60, features_dim=D,
            cpu_tensor=True, pos_fraction=0.8,
        )
    adapter = _FrameworkFalkonAdapter(15.0, 1e-3, 64)
    ocr_ref = classifier_mod.OnlineRegionClassifier(
        adapter, ref_pos_t, ref_neg_t, dict(stats), cfg_path=cfg_path
    )
    with legacy_torch():
        ref_models = ocr_ref.trainRegionClassifier(output_dir=None)
        ref_preds = ocr_ref.testRegionClassifier(
            ref_models,
            [{"feat": torch.from_numpy(probe),
              "gt": np.zeros(len(probe), np.int64),
              "boxes": np.zeros((len(probe), 4), np.float32),
              "img_size": IMG_SIZE}],
        )

    from online_detection_tpu.modules import facades
    from online_detection_tpu.utils.stats import compute_feature_stats

    p_cap = max(len(p) for p in my_pos)
    b_cap = max((len(b) for nb in my_neg for b in nb), default=1)
    pos_buf = np.zeros((N_CLS1, p_cap, D), np.float32)
    pv = np.zeros((N_CLS1, p_cap), bool)
    neg_buf = np.zeros((N_CLS1, ITERATIONS, b_cap, D), np.float32)
    nv = np.zeros((N_CLS1, ITERATIONS, b_cap), bool)
    for c in range(N_CLS1):
        pos_buf[c, : len(my_pos[c])] = my_pos[c]
        pv[c, : len(my_pos[c])] = True
        for b, rows in enumerate(my_neg[c]):
            neg_buf[c, b, : len(rows)] = rows
            nv[c, b, : len(rows)] = True
    my_stats = compute_feature_stats(
        np.random.default_rng(0), jnp.asarray(pos_buf), jnp.asarray(pv),
        jnp.asarray(neg_buf), jnp.asarray(nv),
        num_samples=60, pos_fraction=0.8, index_fn=STATS_INDEX_FN,
    )
    wrapper = facades.FALKONWrapper(cfg_path=cfg_path)
    my_neg_lists = [[b for b in nb if len(b)] for nb in my_neg]
    ocr_my = facades.OnlineRegionClassifier(
        wrapper, my_pos, my_neg_lists, my_stats.as_dict(), cfg_path=cfg_path
    )
    my_model = ocr_my.trainRegionClassifier()
    my_preds = ocr_my.testRegionClassifier(
        my_model,
        [{"feat": probe, "gt": np.zeros(len(probe), np.int64),
          "boxes": np.zeros((len(probe), 4), np.float32),
          "img_size": IMG_SIZE}],
    )

    ref_scores = np.asarray(ref_preds[0].get_field("scores"))
    my_scores = np.asarray(my_preds[0]["scores"])
    assert my_scores.shape == ref_scores.shape == (len(probe), N_CLS1 + 1)
    np.testing.assert_allclose(
        my_scores, ref_scores, rtol=1e-4, atol=1e-5,
        err_msg="post-update detection scores diverged",
    )
    # non-trivial: the new class must actually fire above the -2.0 floor
    assert my_scores[:, N_CLS1].max() > -2.0
