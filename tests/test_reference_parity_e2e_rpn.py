"""COMPOSED end-to-end differential for the ON-LINE RPN chain.

Third of the composed-chain trio (``test_reference_parity_e2e.py`` composes
the detection chain, ``test_reference_parity_e2e_segm.py`` the segmentation
chain): the same synthetic anchor world produces the SAME final proposals
and average recall through two complete implementations of the O-RPN
protocol (``run_experiment_online_rpn_ood_oos.py:86-121`` — per-anchor
FALKON objectness + per-anchor RLS refiners replacing the pretrained RPN
logits/regression):

reference (the LITERAL files, CPU torch):
    ``rpn_getProposals.RPNModule.forward`` per train image (with its REAL
    ``anchor_generator.py`` sibling)
    -> ``py_od_utils.computeFeatStatistics_torch``
    -> ``OnlineRegionClassifier(is_rpn=True).trainRegionClassifier``
       (its classifier backend being THIS framework's FALKON solver behind
       the reference train/predict interface — the reference's own backend
       is external CUDA)
    -> ``py_od_utils.normalize_COXY`` + ``train_region_refiner.
       RegionRefinerTrainer(is_rpn=True)`` (start_index=0: per-anchor)
    -> ``rpn.RPNHead.forward`` online path (manual z-score + sequential
       FALKON objectness + RLS refinement, ``rpn.py:106-186``)
    -> ``rpn/inference.RPNPostProcessor`` (sigmoid, top-k, decode, clip,
       NMS 0.7, post-NMS top-n)
    -> ``average_recall.compute_average_recall``

this framework (production surfaces only):
    ``engine/harvest.harvest_rpn`` + ``engine/accumulate.HarvestAccumulator``
    -> ``utils/stats.compute_feature_stats``
    -> ``pipelines.online_pipeline._zscore_pools`` +
       ``solvers/minibootstrap.train_classifiers_minibootstrap``
    -> ``utils/stats.zscore`` + ``pipelines.online_pipeline.
       _fit_rls_per_class`` (the batched RLS device solver)
    -> ``models/rpn.rpn_online`` (fused per-anchor FALKON/RLS head)
    -> ``models/rpn.propose``
    -> ``engine/harvest.average_recall``

The reference head's 3x3 conv is pinned to an identity tap on both sides
(features are constructed non-negative so its ReLU is exact identity):
the conv itself and its OIHW->HWIO conversion are already differentially
proven by ``test_reference_parity_inference.py::
test_online_rpn_head_matches_reference``; this file is about the
COMPOSITION of harvest -> stats -> training -> head -> proposal selection.

Determinism notes: sampling pinned on both sides
(``deterministic_torch_sampling`` / ``HarvestConfig.parity_sampling`` /
a shared stats index scheme); FALKON M exceeds every cache size
(deterministic all-rows center selection); a margin guard asserts no
minibootstrap mining score lands within 1e-3 of the hard/easy thresholds;
``pre_nms_top_n`` exceeds the anchor count so top-k cannot reorder under
f32 noise.
"""

import math
import types

import numpy as np
import pytest
import torch
import yaml

import jax
import jax.numpy as jnp

from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import (
    HarvestConfig,
    average_recall,
    harvest_rpn,
)
from online_detection_tpu.models.rpn import OnlineRPNModels, propose, rpn_online
from online_detection_tpu.pipelines.online_pipeline import (
    _fit_rls_per_class,
    _zscore_pools,
)
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)
from online_detection_tpu.utils.stats import compute_feature_stats, zscore
from tests.ref_shims import (
    RefCfg,
    deterministic_torch_sampling,
    legacy_torch,
    load_average_recall_module,
    load_online_det_postprocessor_standalone_module,  # noqa: F401  (stubs)
    load_reference_module,
    load_rpn_harvest_module,
    load_rpn_inference_module,
    load_rpn_postprocessor_module,
)
from tests.test_reference_parity_e2e import _FrameworkFalkonAdapter
from tests.test_reference_parity_harvest import (
    RPN_A,
    RPN_IMG_H,
    RPN_IMG_W,
    _boxlist,
    _rpn_cfg,
)

pytestmark = pytest.mark.fast

D = 16
GRID_H, GRID_W = 5, 6
N_TRAIN = 3
N_TEST = 2
ITERATIONS = 2
BATCH_SIZE = 8
NPICK = math.ceil(BATCH_SIZE * ITERATIONS / N_TRAIN)
SIGMA, LAM, M = 8.0, 1e-3, 256  # M > any cache -> deterministic centers
RLS_LAM = 100.0
ANCHOR_NAMES = [f"anchor_{i}" for i in range(RPN_A)]
PRE_NMS, POST_NMS, NMS_THRESH = 1000, 30, 0.7
STATS_INDEX_FN = lambda n, size: np.arange(size) % max(int(n), 1)  # noqa: E731


def _iou_one_many(a, bs):
    bs = np.asarray(bs, np.float32).reshape(-1, 4)
    ix = np.clip(
        np.minimum(a[2], bs[:, 2]) - np.maximum(a[0], bs[:, 0]), 0, None
    )
    iy = np.clip(
        np.minimum(a[3], bs[:, 3]) - np.maximum(a[1], bs[:, 1]), 0, None
    )
    inter = ix * iy
    ua = (
        (a[2] - a[0]) * (a[3] - a[1])
        + (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1])
        - inter
    )
    return inter / np.maximum(ua, 1e-9)


def _make_world(anchors_np, vis_np, seed=11):
    """Anchor world with objectness-informative, NON-NEGATIVE features.

    A grid position whose visible anchors overlap a GT carries the fg
    prototype; everything else carries the bg prototype. Non-negativity
    makes the reference head's ReLU-after-identity-conv exact, and the
    separation makes the trained O-RPN's average recall non-trivial."""
    rng = np.random.default_rng(seed)
    proto_fg = rng.uniform(0.8, 2.0, D).astype(np.float32)
    proto_bg = rng.uniform(0.0, 0.5, D).astype(np.float32)

    def feats_for(gt_boxes):
        t = np.empty((GRID_H, GRID_W, D), np.float32)
        for p in range(GRID_H * GRID_W):
            best, best_pair = 0.0, None
            for a in range(RPN_A):
                i = p * RPN_A + a
                if vis_np[i]:
                    for g in np.asarray(gt_boxes, np.float32):
                        iou = float(_iou_one_many(g, anchors_np[i]))
                        if iou > best:
                            best, best_pair = iou, (anchors_np[i], g)
            proto = proto_fg if best > 0.3 else proto_bg
            row = proto + rng.uniform(0.0, 0.1, D).astype(np.float32)
            if best_pair is not None and best > 0.3:
                # embed the anchor->GT box deltas so the RLS refiners have
                # linear signal to learn (shifted to stay non-negative)
                an, g = best_pair
                aw, ah = an[2] - an[0], an[3] - an[1]
                gw, gh = g[2] - g[0], g[3] - g[1]
                dx = ((g[0] + g[2]) - (an[0] + an[2])) / (2 * aw)
                dy = ((g[1] + g[3]) - (an[1] + an[3])) / (2 * ah)
                dw, dh = np.log(gw / aw), np.log(gh / ah)
                row[:4] = np.maximum(
                    1.5 + np.array([dx, dy, dw, dh], np.float32), 0.0
                )
            t[p // GRID_W, p % GRID_W] = row
        return t

    train_gts = [
        [[4.0, 6.0, 21.0, 19.0], [25.0, 22.0, 43.0, 34.0]],
        [[9.0, 11.0, 27.0, 26.0]],
        [[2.0, 3.0, 17.0, 30.0], [20.0, 5.0, 44.0, 21.0]],
    ][:N_TRAIN]
    test_gts = [
        [[6.0, 8.0, 23.0, 22.0], [26.0, 18.0, 45.0, 33.0]],
        [[12.0, 9.0, 31.0, 27.0]],
    ][:N_TEST]
    train = [{"gt": g, "t": feats_for(g)} for g in train_gts]
    test = [{"gt": g, "t": feats_for(g)} for g in test_gts]
    return train, test


def _write_cfg_yaml(tmp_path):
    """The RPN subtree the reference OnlineRegionClassifier(is_rpn=True)
    reads (``OnlineRegionClassifier.py:24-31``)."""
    cfg = {
        "RPN": {
            "NUM_CLASSES": RPN_A + 1,
            "CHOSEN_CLASSES": ANCHOR_NAMES,
            "ONLINE_REGION_CLASSIFIER": {
                "CLASSIFIER": {"lambda": LAM, "sigma": SIGMA, "M": M},
                "MINIBOOTSTRAP": {"HARD_THRESH": -0.7, "EASY_THRESH": -0.9},
            },
        }
    }
    path = tmp_path / "cfg_online_e2e_rpn.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


class _RefHeadClassifier:
    """Adapter model behind the reference head's sequential classifier
    interface (``rpn.py:193-199``: ``classifier.predict(features)`` ->
    [area, 1])."""

    def __init__(self, adapter, model):
        self.adapter = adapter
        self.model = model

    def predict(self, features):
        return self.adapter.predict(self.model, features).reshape(-1, 1)


def _run_reference(train, test, cfg_path):
    mod = load_rpn_harvest_module()
    import sys

    ag_mod = sys.modules["ref_harvest_rpn.anchor_generator"]
    classifier_mod = load_reference_module(
        "src/modules/region-classifier/OnlineRegionClassifier.py",
        "ref_online_region_classifier",
        ("src/modules/region-classifier", "src/modules", "src"),
    )
    utils_mod = load_reference_module(
        "src/py_od_utils.py", "ref_py_od_utils", ("src",)
    )
    refiner_mod = load_reference_module(
        "src/modules/region-refiner/region_refiner_trainer/"
        "train_region_refiner.py",
        "ref_train_region_refiner",
    )
    inf_mod = load_rpn_inference_module()
    post_mod = load_rpn_postprocessor_module()
    ar_mod = load_average_recall_module()
    BoxCoder = sys.modules["maskrcnn_benchmark.modeling.box_coder"].BoxCoder

    cfg = _rpn_cfg(
        iterations=ITERATIONS, batch_size=BATCH_SIZE, num_images=N_TRAIN
    )
    images = types.SimpleNamespace(image_sizes=[(RPN_IMG_H, RPN_IMG_W)])

    # 1. harvest (the literal stateful module, persisted across the stream)
    with legacy_torch(), deterministic_torch_sampling():
        t0 = torch.tensor(train[0]["t"].transpose(2, 0, 1))
        anchors_bl = ag_mod.make_anchor_generator(cfg)(images, t0)[0][0]
        m = mod.RPNModule(cfg, in_channels=D)
        for img in train:
            t_chw = torch.tensor(img["t"].transpose(2, 0, 1))
            m.forward(
                images, [t_chw[None]],
                gt_bbox=_boxlist(img["gt"], (RPN_IMG_W, RPN_IMG_H)),
            )
    positives = [torch.cat(m.positives[a]) for a in range(RPN_A)]
    negatives = [
        [b.clone() for b in m.negatives[a] if len(b)] for a in range(RPN_A)
    ]
    coxy = {
        "C": torch.cat(m.C).view(-1),
        "O": None,
        "X": torch.cat(m.X),
        "Y": torch.cat(m.Y),
    }

    # 2. stats (literal, pinned sampling)
    with legacy_torch(), deterministic_torch_sampling(STATS_INDEX_FN):
        stats = utils_mod.computeFeatStatistics_torch(
            positives, negatives, num_samples=60, features_dim=D,
            cpu_tensor=True, pos_fraction=0.8,
        )

    # 3. per-anchor minibootstrap FALKON training (literal orchestration,
    #    our solver, is_rpn semantics: cfg['RPN'] subtree, A classifiers)
    adapter = _FrameworkFalkonAdapter(SIGMA, LAM, M)
    ocr = classifier_mod.OnlineRegionClassifier(
        adapter, positives, negatives, dict(stats),
        cfg_path=cfg_path, is_rpn=True,
    )
    with legacy_torch():
        models = ocr.trainRegionClassifier(opts={"is_rpn": True})

    # threshold-margin guard over the MINING scores only
    mining = np.concatenate([s.reshape(-1) for s in adapter.score_log])
    margin = np.minimum(np.abs(mining + 0.7), np.abs(mining + 0.9)).min()
    assert margin > 1e-3, f"mining score within {margin} of a threshold"

    # 4. per-anchor RLS refiners (literal trainer, start_index=0,
    #    z-scored COXY exactly as run_..._oos.py:114)
    ref_cfg = {"CHOSEN_CLASSES": ANCHOR_NAMES, "REGION_REFINER": {"opts": {}}}
    with legacy_torch():
        coxy_n = utils_mod.normalize_COXY(
            {k: (v.clone() if torch.is_tensor(v) else v)
             for k, v in coxy.items()},
            stats, cpu=True,
        )
        rls_models = refiner_mod.RegionRefinerTrainer(
            ref_cfg, RLS_LAM, True
        )(coxy_n)

    # 5. the literal online head (identity conv; sequential FALKON path)
    results = []
    with legacy_torch():
        head = inf_mod.RPNHead(
            RefCfg(INFERENCE=RefCfg(PARALLEL_FALKON=False)),
            in_channels=D, num_anchors=RPN_A,
        )
        with torch.no_grad():
            head.conv.weight.zero_()
            for i in range(D):
                head.conv.weight[i, i, 1, 1] = 1.0
            head.conv.bias.zero_()
        head.classifiers = [
            _RefHeadClassifier(adapter, mdl) if mdl is not None else None
            for mdl in models
        ]
        head.regressors = rls_models
        head.stats = {
            "mean": stats["mean"], "mean_norm": stats["mean_norm"],
        }
        post = post_mod.RPNPostProcessor(
            pre_nms_top_n=PRE_NMS,
            post_nms_top_n=POST_NMS,
            nms_thresh=NMS_THRESH,
            min_size=0,
            box_coder=BoxCoder(weights=(1.0, 1.0, 1.0, 1.0)),
        )
        post.eval()
        for img in test:
            t_chw = torch.tensor(img["t"].transpose(2, 0, 1))
            with torch.no_grad():
                logits, bbox_reg = head.forward([t_chw[None]])
                [props] = post.forward([[anchors_bl]], logits, bbox_reg)
            ar = ar_mod.compute_average_recall(
                _boxlist(img["gt"], (RPN_IMG_W, RPN_IMG_H)), props
            )
            results.append(
                {
                    "boxes": props.bbox.numpy().copy(),
                    "scores": props.get_field("objectness").numpy().copy(),
                    "ar": float(ar),
                }
            )
    anchors_np = anchors_bl.bbox.numpy().copy()
    vis_np = anchors_bl.get_field("visibility").numpy().copy()
    return results, anchors_np, vis_np


def _run_framework(train, test, anchors_np, vis_np):
    # 1. harvest (production fixed-shape chunks + host accumulator)
    hcfg = HarvestConfig(
        num_anchor_classes=RPN_A,
        negatives_to_pick=NPICK,
        rpn_pos_cap=64,
        parity_sampling=True,
    )
    acc = HarvestAccumulator(RPN_A, 1, rpn_dim=D)
    for img in train:
        chunk = jax.device_get(
            harvest_rpn(
                jax.random.key(0),
                jnp.asarray(img["t"]),
                jnp.asarray(anchors_np),
                jnp.asarray(vis_np),
                jnp.asarray(np.asarray(img["gt"], np.float32)),
                jnp.ones((len(img["gt"]),), bool),
                hcfg,
            )
        )
        acc._add_rpn(chunk)
    rpn = acc.finalize_head(
        acc.rpn_pools, D, ITERATIONS, BATCH_SIZE,
        shuffle=False, negatives_to_pick=NPICK,
    )
    rpn["coxy"] = acc._coxy(acc.rpn_coxy, D)

    # 2. stats (production, same pinned index scheme)
    stats = compute_feature_stats(
        np.random.default_rng(0),
        jnp.asarray(rpn["pos"]), jnp.asarray(rpn["pos_valid"]),
        jnp.asarray(rpn["neg"]), jnp.asarray(rpn["neg_valid"]),
        num_samples=60, pos_fraction=0.8, index_fn=STATS_INDEX_FN,
    )

    # 3. per-anchor classifiers (the production vmapped masked loop — the
    #    same calls train_rpn_module makes, with the parity stats)
    pos_z, neg_z = _zscore_pools(rpn, stats)
    falkon = train_classifiers_minibootstrap(
        jax.random.key(1),
        pos_z, jnp.asarray(rpn["pos_valid"]),
        neg_z, jnp.asarray(rpn["neg_valid"]),
        MinibootstrapParams(
            m=M, sigma=SIGMA, lam=LAM, hard_thresh=-0.7, easy_thresh=-0.9
        ),
    )

    # 4. per-anchor RLS refiners on z-scored COXY (train_rpn_module's path)
    cx = zscore(jnp.asarray(rpn["coxy"]["X"]), stats)
    rls = _fit_rls_per_class(
        cx, rpn["coxy"]["Y"], rpn["coxy"]["C"], RPN_A, RLS_LAM,
        zero_based=True,
    )

    # 5-6. fused online head + proposal stage (production inference path)
    models = OnlineRPNModels(falkon=falkon, rls=rls, stats=stats)
    results = []
    for img in test:
        scores, deltas = rpn_online(models, jnp.asarray(img["t"]))
        boxes, obj, valid = propose(
            scores.reshape(-1),
            deltas.reshape(-1, 4),
            jnp.asarray(anchors_np),
            (RPN_IMG_W, RPN_IMG_H),
            pre_nms_top_n=PRE_NMS,
            post_nms_top_n=POST_NMS,
            nms_thresh=NMS_THRESH,
            min_size=0,
        )
        gt = jnp.asarray(np.asarray(img["gt"], np.float32))
        ar = average_recall(
            gt, jnp.ones((len(img["gt"]),), bool), boxes, valid
        )
        keep = np.asarray(valid)
        results.append(
            {
                "boxes": np.asarray(boxes)[keep],
                "scores": np.asarray(obj)[keep],
                "ar": float(ar),
            }
        )
    return results


def test_composed_rpn_chain_matches_reference(tmp_path):
    cfg_path = _write_cfg_yaml(tmp_path)
    # anchors come from the REAL reference generator and feed BOTH sides —
    # anchor parity itself is tests/test_anchors.py's job
    mod = load_rpn_harvest_module()
    import sys

    ag_mod = sys.modules["ref_harvest_rpn.anchor_generator"]
    images = types.SimpleNamespace(image_sizes=[(RPN_IMG_H, RPN_IMG_W)])
    with legacy_torch():
        probe = torch.zeros((D, GRID_H, GRID_W))
        anchors_bl = ag_mod.make_anchor_generator(
            _rpn_cfg(num_images=N_TRAIN)
        )(images, probe)[0][0]
        anchors_np = anchors_bl.bbox.numpy().copy()
        vis_np = anchors_bl.get_field("visibility").numpy().copy()

    train, test = _make_world(anchors_np, vis_np)
    ref_results, ref_anchors, ref_vis = _run_reference(train, test, cfg_path)
    np.testing.assert_array_equal(ref_anchors, anchors_np)
    got_results = _run_framework(train, test, anchors_np, vis_np)

    assert len(got_results) == len(ref_results) == N_TEST
    for i, (got, ref) in enumerate(zip(got_results, ref_results)):
        assert len(got["scores"]) == len(ref["scores"]), f"image {i}"
        # sort both by descending score (the reference postprocessor does
        # not sort for non-RPN_ONLY models; ours returns NMS order)
        go = np.argsort(-got["scores"], kind="stable")
        ro = np.argsort(-ref["scores"], kind="stable")
        np.testing.assert_allclose(
            got["scores"][go], ref["scores"][ro], atol=1e-4, rtol=1e-4,
            err_msg=f"proposal scores, image {i}",
        )
        np.testing.assert_allclose(
            got["boxes"][go], ref["boxes"][ro], atol=2e-3, rtol=1e-4,
            err_msg=f"proposal boxes, image {i}",
        )
        np.testing.assert_allclose(
            got["ar"], ref["ar"], atol=1e-4, err_msg=f"average recall, image {i}"
        )
    # non-degeneracy: the trained O-RPN must actually find the GTs
    ars = [r["ar"] for r in got_results]
    assert min(ars) > 0.12, f"degenerate world, AR={ars}"
    assert max(ars) < 1.0, f"suspiciously perfect AR={ars}"
