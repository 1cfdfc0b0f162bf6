"""COMPOSED end-to-end differential: literal reference chain vs this framework.

The per-stage parity suites prove each arrow of the pipeline in isolation;
this file proves the COMPOSITION — the same synthetic dataset produces the
SAME per-class AP table through two complete implementations of the
"O-OD"-style cached-test_boxes pipeline
(``run_experiment_online_rpn_ood.py:149-215``):

reference (the LITERAL files, CPU torch):
    ``box_head_getProposals.ROIBoxHead.forward_train`` per train image
    -> ``py_od_utils.computeFeatStatistics_torch``
    -> ``OnlineRegionClassifier.trainRegionClassifier`` (zScores +
       trainWithMinibootstrap, its classifier backend being THIS framework's
       FALKON solver behind the reference ``train/predict`` interface — the
       reference's own backend is external CUDA)
    -> ``py_od_utils.normalize_COXY`` + ``train_region_refiner.
       RegionRefinerTrainer``
    -> ``OnlineRegionClassifier.testRegionClassifier``
    -> ``predict_regions.RegionPredictor``
    -> ``OnlineDetectionPostProcessor_standalone``
    -> ``icw_eval.eval_detection_icw``

this framework (production surfaces only):
    ``engine/harvest.harvest_detector`` + ``engine/accumulate.
    HarvestAccumulator``
    -> ``utils/stats.compute_feature_stats``
    -> ``modules.facades.OnlineRegionClassifier.trainRegionClassifier``
       (the vmapped masked minibootstrap + FALKON fit)
    -> ``utils/stats.normalize_coxy`` + ``facades.RegionRefiner.
       trainRegionRefiner``
    -> ``facades.OnlineRegionClassifier.testRegionClassifier``
    -> ``facades.RegionRefiner.predict``
    -> ``facades.AccuracyEvaluatorStandalone`` (standalone postprocessor +
       ``data/evaluation/voc_eval``)

Determinism notes (why exact AP equality is expected):
- sampling is pinned on both sides (``deterministic_torch_sampling`` /
  ``HarvestConfig.parity_sampling`` / a shared stats ``index_fn``);
- FALKON M exceeds every cache size, so Nystrom center selection follows its
  deterministic all-rows branch on both sides (``solvers/falkon.
  select_nystrom_centers``) — the two orchestrations then solve the same
  system and differ only in f32 summation order;
- a margin guard asserts no minibootstrap mining score lands within 1e-3 of
  the hard/easy thresholds, so the ~1e-5 cross-implementation noise cannot
  flip cache membership.
"""

import math

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import HarvestConfig, harvest_detector
from tests.ref_shims import (
    StubBoxFeatureExtractor,
    deterministic_torch_sampling,
    install_maskrcnn_eval_stubs,
    legacy_torch,
    load_box_head_harvest_module,
    load_online_det_postprocessor_standalone_module,
    load_reference_module,
)
from tests.test_reference_parity_harvest import _boxlist, _det_cfg

pytestmark = pytest.mark.fast

# ---------------------------------------------------------------- the world

N_CLS = 2  # foreground classes
D = 16
IMG_SIZE = (60, 50)  # (w, h)
N_TRAIN = 3
ITERATIONS = 2
BATCH_SIZE = 10
NPICK = math.ceil(BATCH_SIZE * ITERATIONS / N_TRAIN)
SIGMA, LAM, M = 15.0, 1e-3, 64
RLS_LAM = 1000.0
CLASS_NAMES = ["__background__", "clsA", "clsB"]
STATS_INDEX_FN = lambda n, size: np.arange(size) % max(int(n), 1)  # noqa: E731


def _boxlist_fields(boxes, size_wh, **fields):
    bl = _boxlist(np.asarray(boxes, np.float32), size_wh)
    for k, v in fields.items():
        bl.add_field(k, v)
    return bl


def _iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = np.asarray(b).T
    ix = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
    iy = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None)
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / np.maximum(ua, 1e-9)


def _make_world(seed=17):
    """Synthetic detection problem with class-informative features.

    Features are class prototypes + noise so the FALKON classifiers actually
    separate the classes and the AP table is non-trivial (some correct
    detections, some confusions, some misses)."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(N_CLS + 1, D)).astype(np.float32) * 2.0  # [bg, c1, c2]

    def feat_for(label, n=1):
        return (protos[label] + 0.35 * rng.normal(size=(n, D))).astype(np.float32)

    def rand_box(lo=2, hi_w=IMG_SIZE[0] - 2, hi_h=IMG_SIZE[1] - 2):
        x1 = rng.uniform(lo, hi_w - 12)
        y1 = rng.uniform(lo, hi_h - 12)
        return np.array(
            [x1, y1, x1 + rng.uniform(8, 24), y1 + rng.uniform(8, 24)],
            np.float32,
        )

    train = []
    for _ in range(N_TRAIN):
        gt_labels = [1, 2]
        gt_boxes = np.stack([rand_box(), rand_box()])
        props = []
        for gi, gl in enumerate(gt_labels):
            for _ in range(4):  # proposals hugging each GT (COXY rows)
                props.append(gt_boxes[gi] + rng.normal(0, 1.5, 4).astype(np.float32))
        for _ in range(16):  # background proposals
            props.append(rand_box())
        props = np.stack(props).astype(np.float32)
        boxes = np.concatenate([gt_boxes, props], axis=0)
        # features by best-IoU class
        feats = np.empty((len(boxes), D), np.float32)
        for r, b in enumerate(boxes):
            ious = _iou(b, gt_boxes)
            lab = int(gt_labels[int(ious.argmax())]) if ious.max() > 0.5 else 0
            feats[r] = feat_for(lab)
        train.append(
            {
                "gt_boxes": gt_boxes,
                "gt_labels": np.asarray(gt_labels, np.int64),
                "boxes": boxes,
                "feats": feats,
            }
        )

    test_boxes, gts = [], []
    for _ in range(3):
        gt_labels = rng.permutation([1, 2])[: int(rng.integers(1, 3))]
        gt_boxes = np.stack([rand_box() for _ in gt_labels])
        rows, labs = [], []
        for gi, gl in enumerate(gt_labels):
            for _ in range(3):
                rows.append(gt_boxes[gi] + rng.normal(0, 2.0, 4).astype(np.float32))
                labs.append(int(gl))
        for _ in range(8):
            rows.append(rand_box())
            labs.append(0)
        rows = np.stack(rows).astype(np.float32)
        feats = np.concatenate([feat_for(l) for l in labs], axis=0)
        # prepend the GT rows themselves (flag gt=1: filtered by the test path)
        all_boxes = np.concatenate([gt_boxes, rows]).astype(np.float32)
        all_feats = np.concatenate(
            [np.concatenate([feat_for(int(l)) for l in gt_labels]), feats]
        ).astype(np.float32)
        gt_flag = np.concatenate(
            [np.ones(len(gt_boxes), np.int64), np.zeros(len(rows), np.int64)]
        )
        test_boxes.append(
            {
                "boxes": all_boxes,
                "feat": all_feats,
                "gt": gt_flag,
                "img_size": IMG_SIZE,
            }
        )
        gts.append(
            {
                "boxes": gt_boxes.copy(),
                "labels": gt_labels.astype(np.int64),
                "difficult": np.zeros(len(gt_labels), bool),
            }
        )
    return train, test_boxes, gts


# ------------------------------------------------- reference-side adapters


class _FrameworkFalkonAdapter:
    """This framework's FALKON solver behind the reference classifier
    interface (``FALKONWrapper_with_centers_selection`` contract: torch in,
    model object out, ``predict(model, X)`` -> torch scores). Logs every
    mining score for the threshold-margin guard."""

    def __init__(self, sigma, lam, m):
        from online_detection_tpu.modules import facades

        self.wrapper = facades.FALKONWrapper()
        self.wrapper.sigma = sigma
        self.wrapper.lam = lam
        self.wrapper.nyst_centers = m
        self.score_log = []

    def train(self, X, y, sigma=None, lam=None):
        return self.wrapper.train(X.numpy(), y.numpy(), sigma=sigma, lam=lam)

    def predict(self, model, X):
        scores = np.asarray(self.wrapper.predict(model, X.numpy()))
        self.score_log.append(scores)
        return torch.from_numpy(scores)


def _write_cfg_yaml(tmp_path):
    cfg = {
        "NUM_CLASSES": N_CLS + 1,
        "CHOSEN_CLASSES": CLASS_NAMES,
        "ONLINE_REGION_CLASSIFIER": {
            "CLASSIFIER": {"lambda": LAM, "sigma": SIGMA, "M": M},
            "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
        },
        "REGION_REFINER": {"opts": {"lambda": RLS_LAM}},
        "EVALUATION": {
            "SCORE_THRESH": -2.0,
            "NMS": 0.3,
            "DETECTIONS_PER_IMAGE": 100,
        },
    }
    path = tmp_path / "cfg_online_e2e.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path), cfg


def _run_reference(train, test_boxes, gts, cfg_path, cfg_dict):
    install_maskrcnn_eval_stubs()
    box_mod = load_box_head_harvest_module()
    classifier_mod = load_reference_module(
        "src/modules/region-classifier/OnlineRegionClassifier.py",
        "ref_online_region_classifier",
        ("src/modules/region-classifier", "src/modules", "src"),
    )
    utils_mod = load_reference_module(
        "src/py_od_utils.py", "ref_py_od_utils", ("src",)
    )
    refiner_mod = load_reference_module(
        "src/modules/region-refiner/region_refiner_trainer/train_region_refiner.py",
        "ref_train_region_refiner",
    )
    predictor_mod = load_reference_module(
        "src/modules/region-refiner/region_predictor/predict_regions.py",
        "ref_predict_regions",
    )
    post_mod = load_online_det_postprocessor_standalone_module()
    eval_mod = load_reference_module(
        "src/modules/feature-extractor/mrcnn_modified/data/datasets/"
        "evaluation/icubworld/icw_eval.py",
        "ref_icw_eval",
        ("src",),
    )

    det_cfg = _det_cfg(
        num_classes=N_CLS, iterations=ITERATIONS, batch_size=BATCH_SIZE,
        num_images=N_TRAIN,
    )

    # 1. harvest (the literal stateful head, persisted across the stream)
    with legacy_torch(), deterministic_torch_sampling():
        StubBoxFeatureExtractor.out_channels = D
        head = box_mod.ROIBoxHead(det_cfg, in_channels=D)
        for img in train:
            StubBoxFeatureExtractor.injected = torch.tensor(img["feats"])
            head.forward_train(
                [None],
                [_boxlist(img["boxes"].copy(), IMG_SIZE)],
                gt_bbox=_boxlist(img["gt_boxes"].copy(), IMG_SIZE),
                gt_label=torch.tensor(img["gt_labels"], dtype=torch.uint8).view(-1, 1),
                img_size=IMG_SIZE,
                gt_labels_list=list(img["gt_labels"]),
            )
    positives = [torch.cat(head.positives[c]) for c in range(N_CLS)]
    negatives = [
        [b.clone() for b in head.negatives[c] if len(b)] for c in range(N_CLS)
    ]
    coxy = {
        "C": torch.cat(head.C).view(-1),
        "O": None,
        "X": torch.cat(head.X),
        "Y": torch.cat(head.Y),
    }

    # 2. stats (literal, pinned sampling)
    with legacy_torch(), deterministic_torch_sampling(STATS_INDEX_FN):
        stats = utils_mod.computeFeatStatistics_torch(
            positives, negatives, num_samples=60, features_dim=D,
            cpu_tensor=True, pos_fraction=0.8,
        )

    # 3. minibootstrap FALKON training (literal orchestration, our solver)
    adapter = _FrameworkFalkonAdapter(SIGMA, LAM, M)
    ocr = classifier_mod.OnlineRegionClassifier(
        adapter, positives, negatives, dict(stats), cfg_path=cfg_path
    )
    with legacy_torch():
        models = ocr.trainRegionClassifier(output_dir=None)

    # threshold-margin guard: cross-implementation f32 noise (~1e-5) must not
    # be able to flip any mining decision
    mining = np.concatenate([s.reshape(-1) for s in adapter.score_log])
    margin = np.minimum(np.abs(mining + 0.7), np.abs(mining + 0.9)).min()
    assert margin > 1e-3, f"mining score within {margin} of a threshold"

    # 4. RLS refiners (literal trainer on the literal normalize_COXY)
    ref_cfg = {"CHOSEN_CLASSES": CLASS_NAMES, "REGION_REFINER": {"opts": {}}}
    with legacy_torch():
        coxy_n = utils_mod.normalize_COXY(
            {k: (v.clone() if torch.is_tensor(v) else v) for k, v in coxy.items()},
            stats, cpu=True,
        )
        rls_models = refiner_mod.RegionRefinerTrainer(ref_cfg, RLS_LAM, False)(coxy_n)

    # 5-6. test scoring + refinement (literal)
    with legacy_torch():
        preds = ocr.testRegionClassifier(models, test_boxes)
        predictor = predictor_mod.RegionPredictor(ref_cfg, rls_models)
        refined = predictor(preds, test_boxes)

    # 7. standalone postprocessor (literal)
    with legacy_torch():
        post = post_mod.OnlineDetectionPostProcessor(
            score_thresh=cfg_dict["EVALUATION"]["SCORE_THRESH"],
            nms=cfg_dict["EVALUATION"]["NMS"],
            detections_per_img=cfg_dict["EVALUATION"]["DETECTIONS_PER_IMAGE"],
            cls_agnostic_bbox_reg=False,
        )
        results = post(refined, N_CLS + 1)

    # 8. literal evaluator
    gt_bls = [
        _boxlist_fields(
            g["boxes"], IMG_SIZE,
            labels=torch.from_numpy(g["labels"]),
            difficult=torch.from_numpy(g["difficult"]),
        )
        for g in gts
    ]
    out = {}
    for thresh in (0.5, 0.7):
        r = eval_mod.eval_detection_icw(
            results, gt_bls, iou_thresh=thresh, use_07_metric=True
        )
        out[thresh] = (np.asarray(r["ap"]), float(r["map"]))
    n_dets = sum(len(r.bbox) for r in results)
    return out, n_dets


def _run_framework(train, test_boxes, gts, cfg_path):
    from online_detection_tpu.modules import facades
    from online_detection_tpu.utils.stats import (
        compute_feature_stats,
        normalize_coxy,
        FeatureStats,
    )

    # 1. harvest (production fixed-shape chunks + host accumulator)
    acc = HarvestAccumulator(1, N_CLS, det_dim=D)
    for img in train:
        g = len(img["gt_labels"])
        hcfg = HarvestConfig(
            num_classes=N_CLS,
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
        acc._add_det(det)
    out = acc.finalize_head(
        acc.det_pools, D, ITERATIONS, BATCH_SIZE,
        shuffle=False, negatives_to_pick=NPICK,
    )
    positives = [out["pos"][c][out["pos_valid"][c]] for c in range(N_CLS)]
    negatives = [
        [
            out["neg"][c, b][out["neg_valid"][c, b]]
            for b in range(ITERATIONS)
            if out["neg_valid"][c, b].any()
        ]
        for c in range(N_CLS)
    ]
    coxy = acc._coxy(acc.det_coxy, D)

    # 2. stats (production, same pinned index scheme)
    p_cap = max(len(p) for p in positives)
    b_cap = max(len(b) for nb in negatives for b in nb)
    n_iter = max(len(nb) for nb in negatives)
    pos_buf = np.zeros((N_CLS, p_cap, D), np.float32)
    pv = np.zeros((N_CLS, p_cap), bool)
    neg_buf = np.zeros((N_CLS, n_iter, b_cap, D), np.float32)
    nv = np.zeros((N_CLS, n_iter, b_cap), bool)
    for c in range(N_CLS):
        pos_buf[c, : len(positives[c])] = positives[c]
        pv[c, : len(positives[c])] = True
        for b, rows in enumerate(negatives[c]):
            neg_buf[c, b, : len(rows)] = rows
            nv[c, b, : len(rows)] = True
    stats = compute_feature_stats(
        np.random.default_rng(0), jnp.asarray(pos_buf), jnp.asarray(pv),
        jnp.asarray(neg_buf), jnp.asarray(nv),
        num_samples=60, pos_fraction=0.8, index_fn=STATS_INDEX_FN,
    )

    # 3. minibootstrap FALKON training (production vmapped loop)
    wrapper = facades.FALKONWrapper(cfg_path=cfg_path)
    ocr = facades.OnlineRegionClassifier(
        wrapper, positives, negatives, stats.as_dict(), cfg_path=cfg_path
    )
    model = ocr.trainRegionClassifier()

    # 4. RLS refiners (production device solver on the normalized COXY)
    refiner = facades.RegionRefiner(cfg_path=cfg_path)
    refiner.trainRegionRefiner(
        {
            "X": np.asarray(normalize_coxy(jnp.asarray(coxy["X"]), stats)),
            "Y": coxy["Y"],
            "C": coxy["C"],
        }
    )

    # 5-6. test scoring + refinement (production facades)
    preds = ocr.testRegionClassifier(model, test_boxes)
    refined_preds = []
    for p in preds:
        raw = p["boxes"]
        keep = ~np.asarray(
            test_boxes[len(refined_preds)]["gt"]
        ).astype(bool).reshape(-1)
        feats = np.asarray(test_boxes[len(refined_preds)]["feat"])[keep]
        # the reference RegionPredictor never normalizes features on this
        # path (predict_regions.py:13 hard-codes normalize_features=False
        # when delegating) — replicate, pass RAW features
        refined = refiner.predict(raw, feats, p["img_size"])  # [N, C*4]
        refined_preds.append(
            {
                "boxes": np.concatenate([raw, refined], axis=1),  # class 0 = raw
                "scores": p["scores"],
                "img_size": p["img_size"],
            }
        )

    # 7-8. standalone postprocessor + evaluator (production facade)
    evaluator = facades.AccuracyEvaluatorStandalone(cfg_path=cfg_path)
    results = evaluator.evaluate(
        gts, refined_preds, iou_thresholds=(0.5, 0.7), use_07_metric=True
    )
    n_dets = sum(len(p["boxes"]) for p in evaluator.postprocess(refined_preds))
    return results, n_dets


def test_composed_pipeline_matches_reference(tmp_path):
    train, test_boxes, gts = _make_world()
    cfg_path, cfg_dict = _write_cfg_yaml(tmp_path)

    ref, ref_n_dets = _run_reference(train, test_boxes, gts, cfg_path, cfg_dict)
    mine, my_n_dets = _run_framework(train, test_boxes, gts, cfg_path)

    assert my_n_dets == ref_n_dets
    for thresh in (0.5, 0.7):
        ref_ap, ref_map = ref[thresh]
        my_ap = np.asarray(mine[f"det_ap_{thresh}"])
        assert my_ap.shape == ref_ap.shape
        np.testing.assert_allclose(
            my_ap, ref_ap, rtol=1e-6, atol=1e-8,
            err_msg=f"per-class AP diverged at IoU {thresh}",
        )
        np.testing.assert_allclose(
            mine[f"det_map_{thresh}"], ref_map, rtol=1e-6,
            err_msg=f"mAP diverged at IoU {thresh}",
        )
    # the synthetic world must be non-trivial for the equality to mean
    # anything: some class must have positive AP, and not all must be perfect
    ap05 = np.asarray(mine["det_ap_0.5"])[1:]
    assert np.nanmax(ap05) > 0.2
    assert ref_n_dets > 4
