"""COMPOSED end-to-end differential for the SEGMENTATION chain.

Companion to ``test_reference_parity_e2e.py`` (which composes the detection
chain): the same synthetic mask world produces the SAME per-class
segmentation AP table through two complete implementations of the
``--eval_segm_with_gt_bboxes`` mask-quality protocol
(``run_experiment_segmentation.py`` + ``roi_heads.py:32-37`` — detections
are the GT boxes; only the mask head is under test):

reference (the LITERAL files, CPU torch):
    ``mask_head_getProposals.ROIMaskHead.forward`` per train image
    -> ``py_od_utils.computeFeatStatistics_torch``
    -> ``OnlineRegionClassifier(is_segmentation=True).trainRegionClassifier``
       (its classifier backend being THIS framework's FALKON solver behind
       the reference train/predict interface, as in the detection e2e — the
       reference's own backend is external CUDA)
    -> ``roi_mask_predictors.MaskRCNNC4Predictor.predict_pixel_FALKON``
       (manual z-score exactly as ``forward`` does before delegating)
    -> ``mask_head/inference.MaskPostProcessor`` (sigmoid + label channel)
    -> ``icw_eval.eval_segmentation_ycbv`` (Masker paste + mask IoU + AP)

this framework (production surfaces only):
    ``engine/harvest.harvest_mask`` + ``engine/accumulate`` mask pools
    -> ``utils/stats.compute_feature_stats``
    -> ``modules.facades.OnlineRegionClassifier(is_segmentation=True)``
    -> ``models/heads.mask_predict`` + ``models/postprocess.
       select_mask_channel``
    -> ``data/evaluation/voc_eval.segmentation_prec_rec`` + ``voc_ap``

Determinism notes: sampling pinned on both sides; FALKON M exceeds every
cache size (deterministic all-rows center selection); a margin guard
asserts no mining score lands within 1e-3 of the thresholds.
"""

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import _ClassPools
from online_detection_tpu.engine.harvest import HarvestConfig, harvest_mask
from tests.ref_shims import (
    RefCfg,
    StubConv5Mask,
    StubSegmentationMasks,
    deterministic_torch_sampling,
    install_maskrcnn_eval_stubs,
    legacy_torch,
    load_mask_head_harvest_module,
    load_mask_predictor_module,
    load_reference_module,
)
from tests.test_reference_parity_harvest import _boxlist

pytestmark = pytest.mark.fast

N_CLS = 2  # foreground classes
D = 12  # per-pixel feature dim (deconv channels)
GRID = 14
IMG_SIZE = (64, 48)  # (w, h)
N_TRAIN = 3
SIGMA, LAM, M = 10.0, 1e-4, 256  # M > any cache -> deterministic centers
SAMPLING_FACTOR = 0.4
CLASS_NAMES = ["__background__", "clsA", "clsB"]
STATS_INDEX_FN = lambda n, size: np.arange(size) % max(int(n), 1)  # noqa: E731


def _box_grid_mask(frac_w):
    """14x14 mask covering the left ``frac_w`` of the box grid."""
    m = np.zeros((GRID, GRID), np.float32)
    m[:, : max(1, int(GRID * frac_w))] = 1.0
    return m


def _make_world(seed=23):
    """Mask world: per-pixel features carry class identity on fg pixels.

    Each object's mask covers the left part of its box; fg pixels draw from
    the object's class prototype, bg pixels from the background prototype.
    Noise makes the learned per-pixel classifiers imperfect, test boxes are
    jittered and one detection per image carries the WRONG label, so the AP
    table is non-trivial (the equality must explain real confusions)."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(N_CLS + 1, D)).astype(np.float32) * 2.5

    def pix(label, n):
        return (protos[label] + 0.5 * rng.normal(size=(n, D))).astype(np.float32)

    def rand_box():
        x1 = rng.uniform(2, IMG_SIZE[0] - 30)
        y1 = rng.uniform(2, IMG_SIZE[1] - 26)
        return np.array(
            [x1, y1, x1 + rng.uniform(16, 26), y1 + rng.uniform(14, 22)],
            np.float32,
        )

    def deconv_for(label, mask14):
        d = np.empty((GRID, GRID, D), np.float32)
        fg = mask14 >= 0.5
        d[fg] = pix(label, int(fg.sum()))
        d[~fg] = pix(0, int((~fg).sum()))
        return d

    train = []
    for _ in range(N_TRAIN):
        labels = np.array([1, 2], np.int32)
        boxes = np.stack([rand_box(), rand_box()])
        masks14 = np.stack(
            [_box_grid_mask(rng.uniform(0.35, 0.7)) for _ in labels]
        )
        deconv = np.stack(
            [deconv_for(int(l), m) for l, m in zip(labels, masks14)]
        )
        train.append(
            {"boxes": boxes, "labels": labels, "masks14": masks14,
             "deconv": deconv}
        )

    w, h = IMG_SIZE
    tests = []
    for ti in range(3):
        labels = np.array([1, 2], np.int64)
        gt_boxes = np.stack([rand_box(), rand_box()])
        gt_masks = np.zeros((len(labels), h, w), bool)
        fracs = [rng.uniform(0.35, 0.7) for _ in labels]
        for i, b in enumerate(gt_boxes):
            x1, y1, x2, y2 = b
            gt_masks[i, int(y1):int(y2),
                     int(x1):int(x1 + fracs[i] * (x2 - x1))] = True
        # detections: the GT boxes (the gt-bboxes protocol) with jitter, and
        # one extra detection with the WRONG label
        det_boxes = gt_boxes + rng.normal(0, 1.5, gt_boxes.shape).astype(np.float32)
        det_labels = labels.copy()
        det_boxes = np.concatenate([det_boxes, gt_boxes[:1] + 2.0])
        det_labels = np.concatenate([det_labels, [2 if labels[0] == 1 else 1]])
        det_scores = rng.uniform(0.3, 1.0, len(det_boxes)).astype(np.float32)
        det_deconv = np.stack([
            deconv_for(int(l), _box_grid_mask(fracs[i % len(fracs)]))
            for i, l in enumerate(det_labels)
        ])
        tests.append({
            "gt_boxes": gt_boxes, "gt_labels": labels, "gt_masks": gt_masks,
            "det_boxes": det_boxes.astype(np.float32),
            "det_labels": det_labels.astype(np.int64),
            "det_scores": det_scores, "det_deconv": det_deconv,
        })
    return train, tests


class _FrameworkFalkonAdapter:
    """Framework FALKON behind the reference classifier interface."""

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
        return torch.from_numpy(scores).reshape(-1, 1)


class _ModelPredictWrap:
    """A trained model as the reference predictor expects: an object with
    ``.predict(features) -> [N, 1]`` (``predict_pixel_FALKON``'s contract)."""

    def __init__(self, model, adapter):
        self.model = model
        self.adapter = adapter

    def predict(self, X):
        return self.adapter.predict(self.model, X)


def _write_cfg_yaml(tmp_path):
    cfg = {
        "NUM_CLASSES": N_CLS + 1,
        "CHOSEN_CLASSES": CLASS_NAMES,
        "ONLINE_SEGMENTATION": {
            "CLASSIFIER": {"lambda": LAM, "sigma": SIGMA, "M": M},
            "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
        },
        "EVALUATION": {"SCORE_THRESH": -2.0, "NMS": 0.3,
                       "DETECTIONS_PER_IMAGE": 100},
    }
    path = tmp_path / "cfg_online_segm_e2e.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def _ref_harvest(train):
    mod = load_mask_head_harvest_module()
    cfg = RefCfg(
        SAVE_FEATURES_DETECTOR=False,
        MODEL=RefCfg(
            ROI_MASK_HEAD=RefCfg(
                SHARE_BOX_FEATURE_EXTRACTOR=True,
                FEATURE_EXTRACTOR="ResNet50Conv5ROIFeatureExtractor",
            )
        ),
        SEGMENTATION=RefCfg(
            FEATURES_DEVICE="cpu", BATCH_SIZE=100000,
            SAMPLING_FACTOR=SAMPLING_FACTOR,
        ),
        MINIBOOTSTRAP=RefCfg(DETECTOR=RefCfg(NUM_CLASSES=N_CLS + 1)),
    )
    with legacy_torch(), deterministic_torch_sampling():
        StubConv5Mask.out_channels = D
        head = mod.ROIMaskHead(cfg, in_channels=D)
        for img in train:
            deconv_nchw = img["deconv"].transpose(0, 3, 1, 2)
            StubConv5Mask.injected = torch.tensor(deconv_nchw)
            gt_bl = _boxlist(img["boxes"].copy(), IMG_SIZE)
            gt_bl.add_field(
                "masks",
                StubSegmentationMasks(
                    [torch.tensor(m) for m in img["masks14"]], IMG_SIZE
                ),
            )
            head.forward(
                torch.tensor(deconv_nchw), None, list(img["labels"]), gt_bl
            )
    positives = [torch.cat(head.positives[c]) for c in range(N_CLS)]
    # the flagship experiment consumes the segmentation negatives as ONE
    # tensor per class wrapped in a single minibootstrap batch
    # (run_experiment_online_rpn_ood_oos.py:252-254)
    negatives = [[torch.cat(head.negatives[c])] for c in range(N_CLS)]
    return positives, negatives


def _run_reference(train, tests, cfg_path):
    install_maskrcnn_eval_stubs()
    classifier_mod = load_reference_module(
        "src/modules/region-classifier/OnlineRegionClassifier.py",
        "ref_online_region_classifier_segm",
        ("src/modules/region-classifier", "src/modules", "src"),
    )
    utils_mod = load_reference_module(
        "src/py_od_utils.py", "ref_py_od_utils_segm", ("src",)
    )
    eval_mod = load_reference_module(
        "src/modules/feature-extractor/mrcnn_modified/data/datasets/"
        "evaluation/icubworld/icw_eval.py",
        "ref_icw_eval_segm",
        ("src",),
    )
    pred_mod = load_mask_predictor_module()

    positives, negatives = _ref_harvest(train)

    with legacy_torch(), deterministic_torch_sampling(STATS_INDEX_FN):
        stats = utils_mod.computeFeatStatistics_torch(
            positives, negatives, num_samples=40, features_dim=D,
            cpu_tensor=True, pos_fraction=0.8,
        )

    adapter = _FrameworkFalkonAdapter(SIGMA, LAM, M)
    ocr = classifier_mod.OnlineRegionClassifier(
        adapter, positives, negatives, dict(stats), cfg_path=cfg_path,
        is_segmentation=True,
    )
    with legacy_torch():
        models = ocr.trainRegionClassifier(output_dir=None)

    mining = np.concatenate([s.reshape(-1) for s in adapter.score_log])
    margin = np.minimum(np.abs(mining + 0.7), np.abs(mining + 0.9)).min()
    assert margin > 1e-3, f"mining score within {margin} of a threshold"

    # literal per-pixel prediction path (forward's manual z-score + the
    # sequential predict_pixel_FALKON reshape) + literal MaskPostProcessor
    import sys

    inference_mod = sys.modules[
        "mrcnn_modified.modeling.roi_heads.mask_head.inference"
    ]
    cfg = RefCfg(
        MODEL=RefCfg(
            ROI_BOX_HEAD=RefCfg(NUM_CLASSES=N_CLS + 1),
            ROI_MASK_HEAD=RefCfg(CONV_LAYERS=[D]),
        ),
        INFERENCE=RefCfg(PARALLEL_FALKON=False),
    )
    with legacy_torch():
        predictor = pred_mod.MaskRCNNC4Predictor(cfg, in_channels=D)
        predictor.classifiers = [
            _ModelPredictWrap(m, adapter) if m is not None else None
            for m in models
        ]
        post = inference_mod.MaskPostProcessor(masker=None)
        pred_bls, gt_bls = [], []
        for t in tests:
            flat = torch.tensor(
                t["det_deconv"].reshape(-1, D), dtype=torch.float32
            )
            z = (flat - stats["mean"]) * (20.0 / stats["mean_norm"])
            scores = predictor.predict_pixel_FALKON(z.float(), GRID)
            bl = _boxlist(t["det_boxes"].copy(), IMG_SIZE)
            bl.add_field("labels", torch.from_numpy(t["det_labels"]))
            bl.add_field("scores", torch.from_numpy(t["det_scores"]))
            pred_bls.append(post(scores, [bl])[0])

            class SegMasksStub:
                def __init__(self, m):
                    self._t = m

                def get_mask_tensor(self):
                    return self._t

            g = _boxlist(t["gt_boxes"].copy(), IMG_SIZE)
            g.add_field("labels", torch.from_numpy(t["gt_labels"]))
            g.add_field(
                "difficult", torch.zeros(len(t["gt_labels"]), dtype=torch.bool)
            )
            g.add_field(
                "masks",
                SegMasksStub(torch.from_numpy(t["gt_masks"].astype(np.uint8))),
            )
            gt_bls.append(g)

        out = {}
        for thresh in (0.5, 0.7):
            r = eval_mod.eval_segmentation_ycbv(
                pred_bls, gt_bls, iou_thresh=thresh, use_07_metric=True
            )
            out[thresh] = (np.asarray(r["ap"]), float(r["map"]))
    return out


def _run_framework(train, tests, cfg_path):
    from online_detection_tpu.data.evaluation.voc_eval import (
        segmentation_prec_rec,
        voc_ap,
    )
    from online_detection_tpu.models.heads import OnlineMaskModels, mask_predict
    from online_detection_tpu.models.postprocess import select_mask_channel
    from online_detection_tpu.modules import facades
    from online_detection_tpu.utils.stats import compute_feature_stats

    # 1. harvest (production fixed-shape chunks folded into per-class pools)
    hcfg = HarvestConfig(
        num_classes=N_CLS, sampling_factor=SAMPLING_FACTOR,
        mask_pix_cap=GRID * GRID, parity_sampling=True,
    )
    pools = _ClassPools(N_CLS)
    for img in train:
        g = len(img["labels"])
        chunk = jax.device_get(
            harvest_mask(
                jax.random.key(0),
                jnp.asarray(img["deconv"]),
                jnp.asarray(img["masks14"]),
                jnp.asarray(img["labels"]),
                jnp.ones((g,), bool),
                hcfg,
            )
        )
        for i, lab in enumerate(img["labels"]):
            pools.add_pos(lab - 1, chunk.pos[i][chunk.pos_valid[i]])
            pools.add_neg(lab - 1, chunk.neg[i][chunk.neg_valid[i]])
    positives = [pools.cat("pos", c, D) for c in range(N_CLS)]
    negatives = [[pools.cat("neg", c, D)] for c in range(N_CLS)]

    # 2. stats (production, same pinned index scheme)
    p_cap = max(len(p) for p in positives)
    b_cap = max(len(nb[0]) for nb in negatives)
    pos_buf = np.zeros((N_CLS, p_cap, D), np.float32)
    pv = np.zeros((N_CLS, p_cap), bool)
    neg_buf = np.zeros((N_CLS, 1, b_cap, D), np.float32)
    nv = np.zeros((N_CLS, 1, b_cap), bool)
    for c in range(N_CLS):
        pos_buf[c, : len(positives[c])] = positives[c]
        pv[c, : len(positives[c])] = True
        neg_buf[c, 0, : len(negatives[c][0])] = negatives[c][0]
        nv[c, 0, : len(negatives[c][0])] = True
    stats = compute_feature_stats(
        np.random.default_rng(0), jnp.asarray(pos_buf), jnp.asarray(pv),
        jnp.asarray(neg_buf), jnp.asarray(nv),
        num_samples=40, pos_fraction=0.8, index_fn=STATS_INDEX_FN,
    )

    # 3. per-pixel FALKON training (production facade, vmapped loop)
    wrapper = facades.FALKONWrapper(cfg_path=cfg_path, is_segmentation=True)
    ocr = facades.OnlineRegionClassifier(
        wrapper, positives, negatives, stats.as_dict(), cfg_path=cfg_path,
        is_segmentation=True,
    )
    model = ocr.trainRegionClassifier()

    # 4-5. per-pixel scoring + label-channel selection (production heads)
    mask_models = OnlineMaskModels(falkon=model, stats=stats)
    preds, gts = [], []
    for t in tests:
        px = mask_predict(mask_models, jnp.asarray(t["det_deconv"]))
        probs = select_mask_channel(px, jnp.asarray(t["det_labels"]))
        preds.append({
            "boxes": t["det_boxes"], "labels": t["det_labels"],
            "scores": t["det_scores"], "masks": np.asarray(probs),
        })
        gts.append({
            "boxes": t["gt_boxes"], "labels": t["gt_labels"],
            "difficult": np.zeros(len(t["gt_labels"]), bool),
            "masks": t["gt_masks"],
        })

    out = {}
    for thresh in (0.5, 0.7):
        prec, rec = segmentation_prec_rec(preds, gts, thresh)
        ap = voc_ap(prec, rec, use_07_metric=True)
        out[thresh] = (np.asarray(ap), float(np.nanmean(ap)))
    return out


def test_composed_segmentation_chain_matches_reference(tmp_path):
    train, tests = _make_world()
    cfg_path = _write_cfg_yaml(tmp_path)

    ref = _run_reference(train, tests, cfg_path)
    mine = _run_framework(train, tests, cfg_path)

    for thresh in (0.5, 0.7):
        ref_ap, ref_map = ref[thresh]
        my_ap, my_map = mine[thresh]
        assert my_ap.shape == ref_ap.shape
        np.testing.assert_allclose(
            my_ap, ref_ap, rtol=1e-6, atol=1e-8,
            err_msg=f"per-class segm AP diverged at IoU {thresh}",
        )
        np.testing.assert_allclose(my_map, ref_map, rtol=1e-6)
    # non-triviality: some class segments well at 0.5, and the 0.7 table
    # must show real degradation somewhere (else the equality proves little)
    ap05 = mine[0.5][0]
    ap07 = mine[0.7][0]
    assert np.nanmax(ap05) > 0.3
    assert np.nanmin(ap07) < np.nanmax(ap05)
