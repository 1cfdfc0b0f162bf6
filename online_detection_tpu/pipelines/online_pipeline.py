"""End-to-end on-line training + evaluation orchestration.

The TPU-native equivalent of the flagship driver
``experiments/run_experiment_online_rpn_ood_oos.py`` (call stack SURVEY.md
§3.1): one streaming harvest pass over the TARGET-TASK train set, then
closed-form/CG solvers for every on-line module, then inference + VOC mAP.

Stage structure and the result.txt timing contract mirror the reference:

  1. harvest (RPN + detector + segmentation features, single CNN pass)
  2. RPN:      stats -> z-score -> 15x FALKON (minibootstrap) + RLS (z-scored COXY)
  3. detector: RLS (raw COXY by default) -> stats -> z-score -> Cx FALKON
  4. segmentation: stats -> z-score -> Cx per-pixel FALKON (M=500)
  5. inference over the test set -> detection/segmentation mAP -> result.txt
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.data.datasets import harvest_annotation
from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.data.evaluation import voc_eval
from online_detection_tpu.data import transforms
from online_detection_tpu.engine.accumulate import HarvestAccumulator
from online_detection_tpu.engine.harvest import HarvestConfig, harvest_image
from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors
from online_detection_tpu.models.detector import (
    DetectorConfig,
    OnlineModelSet,
    detect,
)
from online_detection_tpu.models.heads import OnlineDetectorModels, OnlineMaskModels
from online_detection_tpu.models.rpn import OnlineRPNModels
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)
from online_detection_tpu.solvers.rls import rls_fit
from online_detection_tpu.utils.stats import (
    FeatureStats,
    compute_feature_stats,
    zscore,
)


class OnlineTrainConfig(NamedTuple):
    """Hyperparameters of the on-line modules; defaults =
    ``config_online_rpn_detection_segmentation_ycbv.yaml`` + feature
    extraction config (SURVEY.md §2.4)."""

    num_classes: int = 21
    num_anchor_classes: int = 15
    # FALKON (sigma, lambda, M)
    det_sigma: float = 15.0
    det_lam: float = 1e-5
    det_m: int = 1000
    rpn_sigma: float = 50.0
    rpn_lam: float = 1e-3
    rpn_m: int = 1000
    segm_sigma: float = 10.0
    segm_lam: float = 1e-6
    segm_m: int = 500
    # RLS
    det_reg_lam: float = 1000.0
    rpn_reg_lam: float = 0.01
    # minibootstrap
    iterations: int = 10
    batch_size: int = 2000
    hard_thresh: float = -0.7
    easy_thresh: float = -0.9
    # misc
    pos_fraction_feat_stats: float = 0.8
    use_only_gt_positives_detection: bool = False
    # fraction of the COXY rows used as classifier positives when
    # use_only_gt_positives_detection is off (``--sampling_ratio_positives_
    # detection``, ``load_positives_from_COXY`` samples_fraction,
    # ``py_od_utils.py:226-239``)
    sampling_ratio_positives_detection: float = 1.0
    normalize_features_regressor_detector: bool = False
    segm_batch_size: int = 20000
    with_rpn: bool = True
    with_segmentation: bool = True
    # MINIBOOTSTRAP.{DETECTOR,RPN}.SHUFFLE_NEGATIVES: True -> negative pools
    # shuffled then split into batches (flagship configs); False -> the
    # round-robin arrival-order filling (``rpn_getProposals.py:283-363``)
    shuffle_negatives: bool = False
    rpn_shuffle_negatives: bool = False
    # device-reservoir capacities (device_pipeline): per-class positives and
    # shared COXY rows retained; the reference keeps all positives (unbounded
    # lists) — raise for very long teaching streams. Defaults are budgeted so
    # the flagship configuration (21 classes, 10x2000 pools, d=2048) trains
    # within a 16 GB chip alongside the solver working sets.
    rpn_pos_cap: int = 4096
    det_pos_cap: int = 2048
    coxy_cap: int = 30000
    segm_pos_cap: int = 8192  # positive pixels retained per class
    # solver vmap width (see train_classifiers_minibootstrap.class_chunk)
    solver_class_chunk: int = 8


def _write_result(output_dir: Optional[str], text: str):
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "result.txt"), "a") as fid:
            fid.write(text)


# Jitted-program builders, cached on their STATIC configuration. A fresh
# ``jax.jit(lambda ...)`` per pipeline call would recompile the full R-50
# graph on every harvest/inference invocation (and in every test); the
# configs are hashable NamedTuples, so programs are shared process-wide.


def _jit_harvest_trunk(dcfg: DetectorConfig, with_mask_features: bool):
    """Single-image trunk = the image-batched trunk at B=1, so the host and
    device pipelines share ONE compiled program per static config."""
    from online_detection_tpu.pipelines.device_pipeline import _jit_batched_trunk

    batched = _jit_batched_trunk(dcfg, with_mask_features, None, "mb")

    def fn(p, orpn, a, im, sz, gb, gv):
        outs = batched(p, orpn, a, im[None], sz[None], gb[None], gv[None])
        return jax.tree.map(lambda x: x[0], outs)

    return fn


@functools.lru_cache(maxsize=None)
def _jit_harvest_chunks(hcfg, with_rpn: bool):
    from online_detection_tpu.engine.harvest import harvest_chunks

    return jax.jit(
        lambda k, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm: harvest_chunks(
            k, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm, hcfg,
            with_rpn=with_rpn,
        )
    )


@functools.lru_cache(maxsize=None)
def _jit_detect(dcfg: DetectorConfig, with_masks: bool, gt_mode: bool):
    if gt_mode:
        return jax.jit(
            lambda p, o, a, im, sz, gb, gl, gv: detect(
                p, o, a, im, sz, dcfg, with_masks,
                gt_boxes=gb, gt_labels=gl, gt_valid=gv,
            )
        )
    return jax.jit(
        lambda p, o, a, im, sz: detect(p, o, a, im, sz, dcfg, with_masks)
    )


@functools.lru_cache(maxsize=None)
def _jit_detect_batched(dcfg: DetectorConfig, with_masks: bool, gt_mode: bool,
                        mesh=None, axis_name: str = "mb"):
    """Image-batched inference program (the reference is hard-wired batch 1,
    ``TEST.IMS_PER_BATCH: 1``); with a mesh the batch axis is sharded across
    devices, models replicated. Uses ``detect_batched`` — per-image stages
    vmapped, rowwise head stages flattened across the batch (measured ~2
    ms/img faster than a plain vmap(detect) on v5e; see models/detector.py)."""
    from online_detection_tpu.models.detector import detect_batched

    if gt_mode:
        fn = lambda p, o, a, im, sz, gb, gl, gv: detect_batched(
            p, o, a, im, sz, dcfg, with_masks,
            gt_boxes=gb, gt_labels=gl, gt_valid=gv,
        )
        n_batched = 5
    else:
        fn = lambda p, o, a, im, sz: detect_batched(
            p, o, a, im, sz, dcfg, with_masks
        )
        n_batched = 2
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(fn, in_shardings=(repl, repl, repl) + (batch,) * n_batched)


def _zscore_pools(head: Dict, stats: FeatureStats) -> Tuple[jax.Array, ...]:
    pos = zscore(jnp.asarray(head["pos"]), stats) * head["pos_valid"][..., None]
    neg = zscore(jnp.asarray(head["neg"]), stats) * head["neg_valid"][..., None]
    return pos, neg


def _head_stats(head: Dict, rng: np.random.Generator, pos_fraction: float) -> FeatureStats:
    return compute_feature_stats(
        rng,
        jnp.asarray(head["pos"]), jnp.asarray(head["pos_valid"]),
        jnp.asarray(head["neg"]), jnp.asarray(head["neg_valid"]),
        pos_fraction=pos_fraction,
    )


def _positives_from_coxy(
    coxy: Dict,
    num_classes: int,
    samples_fraction: float = 1.0,
    rng: Optional[np.random.Generator] = None,
):
    """``load_positives_from_COXY`` (``py_od_utils.py:226-239``): per class,
    the COXY rows labeled with that class become classifier positives;
    ``samples_fraction < 1`` keeps a random subset WITHOUT replacement
    (``randperm[:int(n*frac)]``, :232)."""
    xs = np.asarray(coxy["X"])
    cs = np.asarray(coxy["C"]).astype(int)
    rng = rng if rng is not None else np.random.default_rng(0)
    rows_per_class = []
    for c in range(num_classes):
        rows = xs[cs == c + 1]
        if samples_fraction < 1.0 and len(rows):
            keep = rng.permutation(len(rows))[: int(len(rows) * samples_fraction)]
            rows = rows[keep]
        rows_per_class.append(rows)
    cap = max(1, max((len(r) for r in rows_per_class), default=1))
    pos = np.zeros((num_classes, cap, xs.shape[1] if len(xs) else 0), np.float32)
    valid = np.zeros((num_classes, cap), bool)
    for c, rows in enumerate(rows_per_class):
        n = min(len(rows), cap)
        if n:
            pos[c, :n] = rows[:n]
            valid[c, :n] = True
    return pos, valid


def harvest_dataset(
    key: jax.Array,
    params,
    dataset: ICubWorldDataset,
    cfg: OnlineTrainConfig,
    canvas_hw: Tuple[int, int],
    online_rpn: Optional[OnlineRPNModels] = None,
    dcfg: DetectorConfig = DetectorConfig(),
    gt_cap: int = 20,
    output_dir: Optional[str] = None,
    min_size: int = 600,
    max_size: int = 1333,
) -> Dict:
    """One streaming pass over ``dataset`` -> solver-ready feature arrays."""
    t0 = time.time()
    n_images = len(dataset)
    npick = int(np.ceil(cfg.batch_size * cfg.iterations / max(n_images, 1)))
    hcfg = HarvestConfig(
        num_anchor_classes=cfg.num_anchor_classes,
        num_classes=cfg.num_classes,
        negatives_to_pick=npick,
        gt_cap=gt_cap,
    )
    ch, cw = canvas_hw
    anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))

    # two jit units: conv trunk and sampling stages — one fused program sends
    # the TPU compiler into a pathological pass (see harvest.harvest_trunk)
    jit_trunk = _jit_harvest_trunk(dcfg, cfg.with_segmentation)
    jit_chunks = _jit_harvest_chunks(hcfg, cfg.with_rpn)

    from online_detection_tpu.data.loader import CanvasLoader

    acc = HarvestAccumulator(cfg.num_anchor_classes, cfg.num_classes)
    keys = jax.random.split(key, n_images)
    loader_cm = CanvasLoader(dataset, canvas_hw, min_size, max_size)
    with loader_cm as loader:
        for i in range(n_images):
            anno = harvest_annotation(dataset, i)
            canvas, scale, (sw, sh) = loader.get(i)
            boxes = transforms.scale_boxes(anno.boxes, scale)
            g = len(boxes)
            gb = np.zeros((gt_cap, 4), np.float32)
            gb[:g] = boxes[:gt_cap]
            gl = np.zeros((gt_cap,), np.int32)
            gl[:g] = anno.labels[:gt_cap]
            gv = np.arange(gt_cap) < g
            if cfg.with_segmentation:
                from online_detection_tpu.data.mask_project import project_masks_for_image

                masks = dataset.load_masks(i, anno)  # [G, H, W] original res
                gm = project_masks_for_image(masks, gb[:g], scale, gt_cap)
            else:
                gm = None
            vis = anchor_visibility(np.asarray(anchors), (sw, sh))
            t_feats, pb, pv, feats, deconv = jit_trunk(
                params, online_rpn, anchors, jnp.asarray(canvas),
                jnp.asarray([sw, sh]), jnp.asarray(gb), jnp.asarray(gv),
            )
            chunk = jit_chunks(
                keys[i], t_feats, pb, pv, feats, deconv, anchors, jnp.asarray(vis),
                jnp.asarray([sw, sh]), jnp.asarray(gb), jnp.asarray(gl),
                jnp.asarray(gv), jnp.asarray(gm) if gm is not None else None,
            )
            acc.add(chunk)

    out = acc.finalize(
        rpn_iterations=cfg.iterations, rpn_batch_size=cfg.batch_size,
        det_iterations=cfg.iterations, det_batch_size=cfg.batch_size,
        segm_batch_size=cfg.segm_batch_size,
        shuffle_negatives=cfg.shuffle_negatives,
        rpn_shuffle_negatives=cfg.rpn_shuffle_negatives,
        with_rpn=cfg.with_rpn, with_mask=cfg.with_segmentation,
        negatives_to_pick=npick,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "Detector's features extracted in: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    # AR over the harvested stream (``feature_proposal_extractor.py:308-313``)
    _write_result(
        output_dir,
        "Average Recall (AR): {} \n \n".format(out["average_recall"]),
    )
    # never truncate silently: report rows lost to any fixed cap
    trunc = out.get("truncation", {})
    if trunc.get("total", 0) > 0:
        import logging

        logging.getLogger("online_detection_tpu.harvest").warning(
            "fixed-capacity truncation during harvest: %s", trunc
        )
        _write_result(output_dir, "truncated: {} \n".format(trunc))
    out["extraction_time"] = dt
    return out


def train_rpn_module(
    key: jax.Array,
    rpn: Dict,
    cfg: OnlineTrainConfig,
    output_dir: Optional[str] = None,
    seed: int = 0,
    mesh=None,
) -> OnlineRPNModels:
    """Stage 2: per-anchor FALKON classifiers + RLS refiners for the O-RPN.

    ``mesh``: optional 1-D device mesh — the anchor-class axis of the
    minibootstrap is sharded over its devices (SURVEY.md §2.2)."""
    rng = np.random.default_rng(seed)
    stats_rpn = _head_stats(rpn, rng, cfg.pos_fraction_feat_stats)
    t0 = time.time()
    pos, neg = _zscore_pools(rpn, stats_rpn)
    models = train_classifiers_minibootstrap(
        key, pos, jnp.asarray(rpn["pos_valid"]),
        neg, jnp.asarray(rpn["neg_valid"]),
        MinibootstrapParams(
            m=cfg.rpn_m, sigma=cfg.rpn_sigma, lam=cfg.rpn_lam,
            hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
        ),
        mesh=mesh,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "RPN's Online Classifier training time: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    # RPN refiners always train on z-scored COXY (run_..._oos.py:114)
    t0 = time.time()
    coxy = rpn["coxy"]
    cx = zscore(jnp.asarray(coxy["X"]), stats_rpn)
    rls = _fit_rls_per_class(
        cx, coxy["Y"], coxy["C"], cfg.num_anchor_classes, cfg.rpn_reg_lam,
        zero_based=True,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "RPN's Online Region Refiner training time: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    return OnlineRPNModels(falkon=models, rls=rls, stats=stats_rpn)


def train_detector_module(
    key: jax.Array,
    det: Dict,
    cfg: OnlineTrainConfig,
    output_dir: Optional[str] = None,
    seed: int = 0,
    mesh=None,
) -> OnlineDetectorModels:
    """Stage 3: per-class FALKON classifiers + RLS refiners for the detector."""
    rng = np.random.default_rng(seed)
    coxy = det["coxy"]
    if not cfg.use_only_gt_positives_detection and len(coxy["X"]):
        pos_np, pos_valid_np = _positives_from_coxy(
            coxy, cfg.num_classes,
            samples_fraction=cfg.sampling_ratio_positives_detection, rng=rng,
        )
        det = dict(det, pos=pos_np, pos_valid=pos_valid_np)
    stats_det = _head_stats(det, rng, cfg.pos_fraction_feat_stats)

    t0 = time.time()
    reg_x = jnp.asarray(coxy["X"])
    if cfg.normalize_features_regressor_detector:
        reg_x = zscore(reg_x, stats_det)
    det_rls = _fit_rls_per_class(
        reg_x, coxy["Y"], coxy["C"], cfg.num_classes, cfg.det_reg_lam,
        zero_based=False,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "Detector's Online Region Refiner training time: {}min:{}s \n \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )

    t0 = time.time()
    pos, neg = _zscore_pools(det, stats_det)
    det_falkon = train_classifiers_minibootstrap(
        key, pos, jnp.asarray(det["pos_valid"]),
        neg, jnp.asarray(det["neg_valid"]),
        MinibootstrapParams(
            m=cfg.det_m, sigma=cfg.det_sigma, lam=cfg.det_lam,
            hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
        ),
        mesh=mesh,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "Detector's Online Classifier training time: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    return OnlineDetectorModels(falkon=det_falkon, rls=det_rls, stats=stats_det)


def train_segmentation_module(
    key: jax.Array,
    seg: Dict,
    cfg: OnlineTrainConfig,
    output_dir: Optional[str] = None,
    seed: int = 0,
    mesh=None,
) -> OnlineMaskModels:
    """Stage 4: per-pixel FALKON classifiers for the segmentation head."""
    rng = np.random.default_rng(seed)
    stats_seg = _head_stats(seg, rng, cfg.pos_fraction_feat_stats)
    t0 = time.time()
    pos, neg = _zscore_pools(seg, stats_seg)
    seg_falkon = train_classifiers_minibootstrap(
        key, pos, jnp.asarray(seg["pos_valid"]),
        neg, jnp.asarray(seg["neg_valid"]),
        MinibootstrapParams(
            m=cfg.segm_m, sigma=cfg.segm_sigma, lam=cfg.segm_lam,
            hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
        ),
        mesh=mesh,
    )
    dt = time.time() - t0
    _write_result(
        output_dir,
        "Online Segmentation training time: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    return OnlineMaskModels(falkon=seg_falkon, stats=stats_seg)


def train_online_modules(
    key: jax.Array,
    harvest: Dict,
    cfg: OnlineTrainConfig,
    output_dir: Optional[str] = None,
    seed: int = 0,
    mesh=None,
) -> OnlineModelSet:
    """Stages 2-4: FALKON + RLS training for every on-line module."""
    k_rpn, k_det, k_seg = jax.random.split(key, 3)

    online_rpn = None
    if cfg.with_rpn and "rpn" in harvest:
        online_rpn = train_rpn_module(
            k_rpn, harvest["rpn"], cfg, output_dir, seed, mesh=mesh
        )

    online_det = train_detector_module(
        k_det, harvest["det"], cfg, output_dir, seed, mesh=mesh
    )

    online_mask = None
    if cfg.with_segmentation and "mask" in harvest:
        online_mask = train_segmentation_module(
            k_seg, harvest["mask"], cfg, output_dir, seed, mesh=mesh
        )

    return OnlineModelSet(rpn=online_rpn, detector=online_det, mask=online_mask)


def _fit_rls_per_class(x, y, c, num_classes, lam, zero_based):
    """Group COXY rows by class and fit the batched RLS refiners."""
    x = np.asarray(x)
    y = np.asarray(y)
    cls = np.asarray(c).astype(int)
    if not zero_based:
        cls = cls - 1
    cap = max(1, max((int((cls == i).sum()) for i in range(num_classes)), default=1))
    d = x.shape[1] if len(x) else 1
    xb = np.zeros((num_classes, cap, d), np.float32)
    yb = np.zeros((num_classes, cap, 4), np.float32)
    w = np.zeros((num_classes, cap), np.float32)
    for i in range(num_classes):
        rows = cls == i
        n = min(int(rows.sum()), cap)
        if n:
            xb[i, :n] = x[rows][:n]
            yb[i, :n] = y[rows][:n]
            w[i, :n] = 1.0
    return rls_fit(jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(w), lam)


def run_inference(
    params,
    online: OnlineModelSet,
    dataset: ICubWorldDataset,
    canvas_hw: Tuple[int, int],
    dcfg: DetectorConfig = DetectorConfig(),
    with_masks: bool = True,
    output_dir: Optional[str] = None,
    iou_thresholds=(0.5,),
    use_07_metric: bool = True,
    min_size: int = 600,
    max_size: int = 1333,
    eval_segm_with_gt_bboxes: bool = False,
    gt_cap: int = 20,
    batch_size: int = 1,
    mesh=None,
):
    """Test loop + VOC evaluation (``engine/inference.py:266-353`` +
    evaluation dispatch). Returns (results dict, predictions).

    ``eval_segm_with_gt_bboxes`` substitutes GT boxes for the detections
    before the mask head (mask-quality-only protocol, ``roi_heads.py:32-37``).
    ``batch_size`` stacks canvases into one vmapped detect dispatch (the
    reference is hard-wired batch 1); ``mesh`` shards the batch axis.
    """
    from online_detection_tpu.data.loader import CanvasLoader
    from online_detection_tpu.utils.telemetry import (
        Timer,
        profile_trace,
        setup_logger,
        teardown_logger,
    )

    ch, cw = canvas_hw
    anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
    with_masks = with_masks and online.mask is not None
    b = max(1, batch_size)
    if mesh is not None:
        n_dev = mesh.devices.size
        b = int(np.ceil(b / n_dev)) * n_dev
    if b >= 32 and dcfg.roi_chunk is None:
        # bound the RoIAlign separable intermediate at large canvas batches
        # (flat vmap OOMs ~16 GB HBM at batch 32; see ops/roi_align.py)
        dcfg = dcfg._replace(roi_chunk=100)
    jit_detect = _jit_detect_batched(
        dcfg, with_masks, eval_segm_with_gt_bboxes, mesh
    )

    logger = setup_logger("online_detection_tpu.inference", output_dir)
    logger.info(
        "Start evaluation on %d images (masks=%s, gt_bboxes=%s, batch=%d)",
        len(dataset), with_masks, eval_segm_with_gt_bboxes, b,
    )
    inference_timer = Timer()
    loader_ctx = CanvasLoader(dataset, canvas_hw, min_size, max_size)
    trace_ctx = profile_trace(os.environ.get("ODTPU_PROFILE_DIR"))

    n_images = len(dataset)
    predictions, ground_truths = [], []
    t0 = time.time()
    with loader_ctx as loader, trace_ctx:
        for lo in range(0, n_images, b):
            idxs = list(range(lo, min(lo + b, n_images)))
            annos = [dataset.get_annotation(i) for i in idxs]
            loaded = [loader.get(i) for i in idxs]
            while len(loaded) < b:  # pad the tail batch, results discarded
                loaded.append(loaded[-1])
                annos.append(annos[-1])
            canvases = jnp.asarray(np.stack([c for c, _, _ in loaded]))
            sizes = jnp.asarray(
                np.asarray([swh for _, _, swh in loaded], np.int32)
            )
            inference_timer.tic()
            if eval_segm_with_gt_bboxes:
                # the substituted boxes come from the engine-side GT parser
                # (harvest_annotation: -1-shifted for XML datasets), matching
                # the reference where compute_gts_* feeds the model while the
                # evaluator re-reads GT through the dataset class
                hannos = [harvest_annotation(dataset, i) for i in idxs]
                while len(hannos) < b:
                    hannos.append(hannos[-1])
                gbs = np.zeros((b, gt_cap, 4), np.float32)
                gls = np.zeros((b, gt_cap), np.int32)
                gvs = np.zeros((b, gt_cap), bool)
                for k, (anno, (_, scale, _)) in enumerate(zip(hannos, loaded)):
                    g = min(len(anno.boxes), gt_cap)
                    gbs[k, :g] = transforms.scale_boxes(anno.boxes, scale)[:g]
                    gls[k, :g] = anno.labels[:g]
                    gvs[k, :g] = True
                dets_b, mask_b, _, _ = jit_detect(
                    params, online, anchors, canvases, sizes,
                    jnp.asarray(gbs), jnp.asarray(gls), jnp.asarray(gvs),
                )
            else:
                dets_b, mask_b, _, _ = jit_detect(
                    params, online, anchors, canvases, sizes
                )
            dets_b = jax.device_get(dets_b)
            if with_masks and mask_b is not None:
                mask_b = np.asarray(jax.device_get(mask_b))
            inference_timer.toc()
            for k, i in enumerate(idxs):
                anno = annos[k]
                scale = loaded[k][1]
                v = dets_b.valid[k]
                pred = {
                    "boxes": dets_b.boxes[k][v] / scale,  # original coords
                    "scores": dets_b.scores[k][v],
                    "labels": dets_b.labels[k][v],
                }
                if with_masks and mask_b is not None:
                    pred["masks"] = mask_b[k][v]
                predictions.append(pred)
                gt = {
                    "boxes": anno.boxes,
                    "labels": anno.labels,
                    "difficult": anno.difficult,
                }
                if with_masks:
                    gt["masks"] = dataset.load_masks(i, anno)
                ground_truths.append(gt)
    test_time = time.time() - t0
    logger.info(
        "inference done: %.1fs total, %.4fs/img device (%.4fs/img wall)",
        test_time, inference_timer.average_time,
        test_time / max(len(dataset), 1),
    )
    teardown_logger("online_detection_tpu.inference")
    _write_result(
        output_dir,
        "Average image testing time: {:.4f} seconds.\n".format(
            test_time / max(len(dataset), 1)
        ),
    )

    results = voc_eval.evaluate(
        predictions,
        ground_truths,
        dataset.classes,
        iou_thresholds=iou_thresholds,
        use_07_metric=use_07_metric,
        evaluate_segmentation=with_masks,
        output_dir=output_dir,
    )
    return results, predictions
