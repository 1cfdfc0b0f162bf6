"""The zero-roundtrip pipeline: harvest, accumulate, and train fully on-device.

Composition of engine/harvest (trunk+chunks jits), engine/device_accumulate
(HBM reservoirs), and the solvers — per image only a uint8 canvas and a few
KB of GT metadata cross the host->device link, and only the trained models
come back. This is the BASELINE.md north-star loop ("minibootstrap ...
fused on-chip so the full on-line learning loop never round-trips to host").

The host pipeline (pipelines/online_pipeline.py) remains the reference-
compatible path for feature save/load and CPU debugging.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_detection_tpu.data import transforms
from online_detection_tpu.data.datasets import harvest_annotation
from online_detection_tpu.engine import device_accumulate as dacc
from online_detection_tpu.engine.harvest import (
    HarvestConfig,
    harvest_chunks,
    harvest_trunk,
)
from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors
from online_detection_tpu.models.detector import DetectorConfig, OnlineModelSet
from online_detection_tpu.models.heads import OnlineDetectorModels, OnlineMaskModels
from online_detection_tpu.models.rpn import OnlineRPNModels
from online_detection_tpu.pipelines.online_pipeline import (
    OnlineTrainConfig,
    _write_result,
)
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)
from online_detection_tpu.solvers.rls import rls_fit_grouped
from online_detection_tpu.utils.stats import zscore


def _gate_chunk(chunk, valid):
    """Zero a padded image's contribution: clear every validity mask, the
    AR term, and the drop counters (batch tails are padded to the static
    batch size — a padded duplicate's drops must not be counted)."""
    g = lambda m: m & valid
    z = lambda x: x * valid.astype(x.dtype)
    rpn = chunk.rpn
    if rpn is not None:
        rpn = rpn._replace(
            pos_valid=g(rpn.pos_valid), neg_valid=g(rpn.neg_valid),
            pos_dropped=z(rpn.pos_dropped),
        )
    det = chunk.det._replace(
        pos_valid=g(chunk.det.pos_valid),
        neg_valid=g(chunk.det.neg_valid),
        coxy_valid=g(chunk.det.coxy_valid),
        coxy_dropped=z(chunk.det.coxy_dropped),
    )
    mask = chunk.mask
    if mask is not None:
        mask = mask._replace(
            pos_valid=g(mask.pos_valid), neg_valid=g(mask.neg_valid),
            labels_valid=g(mask.labels_valid), dropped=z(mask.dropped),
        )
    ar = jnp.where(valid, chunk.average_recall, 0.0)
    return chunk._replace(rpn=rpn, det=det, mask=mask, average_recall=ar)


@functools.lru_cache(maxsize=None)
def _jit_batched_trunk(dcfg: DetectorConfig, with_mask_features: bool, mesh,
                       axis_name: str):
    """Image-batched (and optionally mesh-sharded) harvest trunk.

    The conv trunk is vmapped over a stacked canvas batch — on one chip this
    batches the MXU work (SURVEY.md §7 "batch the CNN pass"); on a mesh the
    batch axis is sharded over devices (data parallelism, params replicated)
    and XLA runs B/n_dev images per device with zero collectives.
    """
    fn = jax.vmap(
        lambda p, orpn, a, im, sz, gb, gv: harvest_trunk(
            p, orpn, a, im, sz, gb, gv, dcfg,
            with_mask_features=with_mask_features,
        ),
        in_axes=(None, None, None, 0, 0, 0, 0),
    )
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn, in_shardings=(repl, repl, repl, batch, batch, batch, batch)
    )


@functools.lru_cache(maxsize=None)
def _jit_batched_chunks_accumulate(hcfg: HarvestConfig, with_rpn: bool,
                                   num_classes: int):
    """Batched sampling stages + whole-batch reservoir fold, one dispatch.

    harvest_chunks is vmapped over the image batch; the reservoir appends
    are folded by ``dacc.accumulate_batch`` — one stable compaction + one
    write per pool per batch, bit-identical to the sequential per-image
    fold (see ``_compact_batch``) but without the B-step kernel-launch
    serialization that cost ~1.2 ms/img on v5e. Reservoirs must be built
    with ``init_reservoirs(..., batch_size=B)`` so the scratch margins
    cover a whole batch's append.
    """
    def _one(k, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm):
        return harvest_chunks(
            k, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm, hcfg,
            with_rpn=with_rpn,
        )

    vchunks = jax.vmap(
        _one,
        in_axes=(0, 0, 0, 0, 0, 0, None, 0, 0, 0, 0, 0, 0),
    )

    def _batched(st, keys, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm,
                 img_valid):
        chunks = vchunks(keys, t, pb, pv, f, dc, a, v, sz, gb, gl, gv, gm)
        return dacc.accumulate_batch(st, chunks, img_valid, num_classes)

    return jax.jit(_batched, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _jit_chunk_split(chunk: int, iterations: int, batch_size: int,
                     mode: str):
    """Slice a class-chunk out of a negative pool and split it into
    minibootstrap batches, fused in ONE program — the full-width
    [C, I, B, d] split plus the pool plus the solver temporaries exceed the
    chip at flagship scale, so splits are materialized per chunk and freed
    after that chunk trains."""

    def f(key, rows, counts, lo):
        sub = jax.lax.dynamic_slice_in_dim(rows, lo, chunk, axis=0)
        scnt = jax.lax.dynamic_slice_in_dim(counts, lo, chunk, axis=0)
        pool = dacc.Pool(sub, scnt)
        if mode == "shuffle":  # SHUFFLE_NEGATIVES=True
            # per-class keys from ABSOLUTE class indices: the shuffle is
            # invariant to the window boundary `lo`, so multi-chip runs
            # (chunk rounded to a mesh multiple) draw the same per-class
            # streams as single-chip
            kcls = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                lo + jnp.arange(chunk)
            )
            return dacc.shuffle_split(
                key, pool, iterations, batch_size, class_keys=kcls
            )
        if mode == "interleave":  # SHUFFLE_NEGATIVES=False round-robin analog
            return dacc.interleave_split(pool, iterations, batch_size)
        # "arrival": consecutive arrival-order batches (segmentation pools,
        # SEGMENTATION.BATCH_SIZE semantics)
        return dacc.arrival_split(pool, iterations, batch_size)

    return jax.jit(f)


def _train_head_chunked(key, neg_pool, pos, pos_valid, params, stats,
                        iterations: int, batch_size: int,
                        mode: str, chunk: int, mesh=None,
                        axis_name: str = "mb"):
    """Minibootstrap a whole head class-chunk-wise: split chunk -> train
    chunk -> release, bounding the HBM working set. The tail chunk is
    handled by sliding the window back (dynamic_slice clamps), retraining a
    few overlap classes and keeping only the new tail outputs.

    With ``mesh`` the class axis of each chunk's training program is sharded
    over the devices (``train_classifiers_minibootstrap(mesh=...)``), so one
    chunk trains ``chunk`` classes concurrently across the mesh with the
    same per-class production program as single-device."""
    from online_detection_tpu.solvers.falkon import FalkonModel

    c = pos.shape[0]
    if chunk is None or chunk <= 0:
        chunk = c  # <=0/None disables chunking (full-width vmap)
    if mesh is not None:
        # per-device chunking: round the window up to a mesh multiple so
        # every device trains chunk/n_dev classes per call
        n_dev = mesh.devices.size
        chunk = -(-chunk // n_dev) * n_dev
    chunk = min(chunk, c)
    split_fn = _jit_chunk_split(chunk, iterations, batch_size, mode)
    # per-class training keys from ABSOLUTE class indices (not the chunk
    # window): single- and multi-chip runs (whose chunk is rounded up to a
    # mesh multiple, shifting the windows) train every class with bitwise-
    # identical PRNG streams (round-3 advisor finding)
    k_split, k_train = jax.random.split(key)
    all_keys = jax.vmap(lambda i: jax.random.fold_in(k_train, i))(
        jnp.arange(c)
    )
    centers_parts, alpha_parts, exists_parts = [], [], []
    lo = 0
    while lo < c:
        lo_eff = min(lo, c - chunk)
        drop = lo - lo_eff  # overlap classes already trained
        neg, neg_valid = split_fn(
            k_split, neg_pool.rows, neg_pool.counts, lo_eff,
        )
        model = train_classifiers_minibootstrap(
            jax.random.fold_in(k_train, 1000 + lo_eff),
            pos[lo_eff : lo_eff + chunk], pos_valid[lo_eff : lo_eff + chunk],
            neg, neg_valid, params, stats=stats, mesh=mesh,
            axis_name=axis_name,
            class_keys=all_keys[lo_eff : lo_eff + chunk],
        )
        neg = neg_valid = None
        centers_parts.append(model.centers[drop:])
        alpha_parts.append(model.alpha[drop:])
        exists_parts.append(model.exists[drop:])
        lo = lo_eff + chunk
    return FalkonModel(
        jnp.concatenate(centers_parts),
        jnp.concatenate(alpha_parts),
        jnp.concatenate(exists_parts),
        params.sigma,
    )


def reservoir_spec(
    cfg: OnlineTrainConfig,
    gt_cap: int = 20,
    batch_size: int = 1,
    npick: int = 64,
    hcfg: Optional[HarvestConfig] = None,
) -> Dict:
    """The exact ``init_reservoirs`` kwargs :func:`harvest_dataset_device`
    builds for this configuration — the single source of truth for the pool
    shapes, shared with :func:`solver_program_shapes` so the warmed solver
    executables match the reservoirs BY CONSTRUCTION (the round-3 advisor
    found the warm-up deriving P from ``cfg.*_pos_cap`` while the real pools
    carry ``cap + scratch`` rows, turning every warm into a silent miss)."""
    hcfg = hcfg or HarvestConfig(
        num_anchor_classes=cfg.num_anchor_classes,
        num_classes=cfg.num_classes,
        negatives_to_pick=npick, gt_cap=gt_cap,
    )
    return dict(
        num_anchor_classes=cfg.num_anchor_classes,
        num_classes=cfg.num_classes,
        neg_cap=cfg.batch_size * cfg.iterations,
        rpn_pos_cap=cfg.rpn_pos_cap,
        det_pos_cap=cfg.det_pos_cap,
        coxy_cap=cfg.coxy_cap,
        mask_cap=cfg.segm_batch_size * 2,
        mask_pos_cap=cfg.segm_pos_cap,
        chunk_sizes={
            "npick": hcfg.negatives_to_pick, "rpn_pos": hcfg.rpn_pos_cap,
            "gt_cap": hcfg.gt_cap, "coxy": hcfg.coxy_cap,
            "mask_pix": hcfg.mask_pix_cap,
        },
        with_rpn=cfg.with_rpn, with_mask=cfg.with_segmentation,
        batch_size=batch_size,
    )


def solver_program_shapes(
    cfg: OnlineTrainConfig, gt_cap: int = 20, batch_size: int = 1
):
    """The (C, P, I, B, d) pool shapes of the three head minibootstrap
    programs that :func:`train_online_modules_device` will execute for this
    config — derived from the ACTUAL reservoir shapes (``jax.eval_shape``
    over :func:`reservoir_spec`, zero allocation), so P includes the pools'
    batch-append scratch rows and the segmentation iteration count follows
    the real mask pool capacity. ``gt_cap``/``batch_size`` must match the
    harvest call (they size the scratch margins). Feature dims are
    architecture constants: 2048-d res5+avgpool detector features
    (``box_head_getProposals.py:113-115``), 1024-d RPN conv features, 256-d
    conv5_mask pixel features (SURVEY.md §2.4). ``negatives_to_pick`` only
    pads the negative pools' scratch, which the chunk splitter never reads
    past — it does not enter the solver signature."""
    spec = reservoir_spec(cfg, gt_cap=gt_cap, batch_size=batch_size)
    res = jax.eval_shape(lambda: dacc.init_reservoirs(**spec))

    def chunk(c):
        ck = cfg.solver_class_chunk
        return c if not ck or ck <= 0 else min(ck, c)

    shapes = {
        "detector": (
            chunk(cfg.num_classes), res.det_pos.rows.shape[1],
            cfg.iterations, cfg.batch_size, 2048,
            MinibootstrapParams(
                m=cfg.det_m, sigma=cfg.det_sigma, lam=cfg.det_lam,
                hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh),
        ),
    }
    if cfg.with_rpn:
        shapes["rpn"] = (
            chunk(cfg.num_anchor_classes), res.rpn_pos.rows.shape[1],
            cfg.iterations, cfg.batch_size, 1024,
            MinibootstrapParams(
                m=cfg.rpn_m, sigma=cfg.rpn_sigma, lam=cfg.rpn_lam,
                hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh),
        )
    if cfg.with_segmentation:
        # train_online_modules_device derives the segmentation iteration
        # count from the mask pool's FULL row count (cap + scratch)
        seg_iters = max(
            1, -(-res.mask_neg.rows.shape[1] // cfg.segm_batch_size)
        )
        shapes["segm"] = (
            chunk(cfg.num_classes), res.mask_pos.rows.shape[1], seg_iters,
            cfg.segm_batch_size, 256,
            MinibootstrapParams(
                m=cfg.segm_m, sigma=cfg.segm_sigma, lam=cfg.segm_lam,
                hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh),
        )
    return shapes


def warm_solver_programs(
    cfg: OnlineTrainConfig,
    background: bool = True,
    gt_cap: int = 20,
    batch_size: int = 1,
):
    """AOT-compile and device-load the minibootstrap executables that
    :func:`train_online_modules_device` will run for ``cfg``.

    The flagship unrolled programs serialize to tens of MB and their device
    upload is LAZY (paid at first execution — ~70-90 s over a thin tunnel
    link even on a compile-cache hit, BASELINE.md); warming them on
    background threads while the feature-harvest pass runs takes the load
    off the training-time critical path. Returns the list of threads
    (already started) when ``background``, else runs inline.
    """
    import threading

    from online_detection_tpu.solvers.minibootstrap import warm_train_program

    threads = []
    shapes = solver_program_shapes(cfg, gt_cap=gt_cap, batch_size=batch_size)
    for _name, (c, p, i, b, d, params) in shapes.items():
        if background:
            t = threading.Thread(
                target=warm_train_program, args=(c, p, i, b, d, params),
                daemon=True,
            )
            t.start()
            threads.append(t)
        else:
            warm_train_program(c, p, i, b, d, params)
    return threads


def harvest_dataset_device(
    key: jax.Array,
    params,
    dataset,
    cfg: OnlineTrainConfig,
    canvas_hw: Tuple[int, int],
    online_rpn: Optional[OnlineRPNModels] = None,
    dcfg: DetectorConfig = DetectorConfig(),
    gt_cap: int = 20,
    output_dir: Optional[str] = None,
    min_size: int = 600,
    max_size: int = 1333,
    batch_size: int = 1,
    mesh=None,
) -> Tuple[dacc.DeviceReservoirs, Dict]:
    """Streaming pass with HBM reservoirs. Returns (reservoirs, meta).

    ``batch_size`` > 1 stacks canvases and runs the conv trunk image-batched
    (one MXU-friendly program instead of B dispatches); with ``mesh`` the
    batch axis is sharded across devices (data parallelism, SURVEY.md §2.2).
    Host decode/resize overlaps device compute via the native prefetcher
    (``data/loader.CanvasLoader``).
    """
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
    neg_cap = cfg.batch_size * cfg.iterations

    from online_detection_tpu.data.loader import CanvasLoader

    b = max(1, batch_size)
    if mesh is not None:
        n_dev = mesh.devices.size
        b = int(np.ceil(b / n_dev)) * n_dev  # batch must tile the mesh

    state = dacc.init_reservoirs(
        **reservoir_spec(cfg, gt_cap=gt_cap, batch_size=b, hcfg=hcfg)
    )
    if b >= 32 and dcfg.roi_chunk is None:
        # bound the RoIAlign separable intermediate at large canvas batches
        # (flat vmap OOMs ~16 GB HBM at batch 32; see ops/roi_align.py)
        dcfg = dcfg._replace(roi_chunk=100)
    jit_trunk = _jit_batched_trunk(dcfg, cfg.with_segmentation, mesh, "mb")
    jit_chunks_acc = _jit_batched_chunks_accumulate(
        hcfg, cfg.with_rpn, cfg.num_classes
    )

    def _host_item(loader, i):
        """Decode + GT assembly for one image (all host-side, prefetched)."""
        anno = harvest_annotation(dataset, i)
        canvas, scale, (sw, sh) = loader.get(i)
        boxes = transforms.scale_boxes(anno.boxes, scale)
        g = len(boxes)
        gb = np.zeros((gt_cap, 4), np.float32)
        gb[:g] = boxes[:gt_cap]
        gl = np.zeros((gt_cap,), np.int32)
        gl[:g] = anno.labels[:gt_cap]
        gv = np.arange(gt_cap) < g
        gm = None
        if cfg.with_segmentation:
            # host-side mask projection: only [G, 14, 14] floats (3 KB) cross
            # the host->device link (vs MBs of canvas-resolution masks)
            from online_detection_tpu.data.mask_project import project_masks_for_image

            masks = dataset.load_masks(i, anno)
            gm = project_masks_for_image(masks, gb[:g], scale, gt_cap)
        vis = anchor_visibility(np.asarray(anchors), (sw, sh))
        return canvas, (sw, sh), gb, gl, gv, gm, vis

    from online_detection_tpu.utils.telemetry import setup_logger, teardown_logger

    logger = setup_logger("online_detection_tpu.harvest", output_dir)
    keys = jax.random.split(key, int(np.ceil(n_images / b)) * b).reshape(-1, b)
    with CanvasLoader(dataset, canvas_hw, min_size, max_size) as loader:
        logger.info(
            "harvest (device reservoirs): %d images, batch %d, mesh %s, "
            "native prefetch %s", n_images, b,
            getattr(mesh, "shape", None), loader.native,
        )
        for lo in range(0, n_images, b):
            items = [_host_item(loader, i) for i in range(lo, min(lo + b, n_images))]
            n_real = len(items)
            while len(items) < b:  # pad the tail batch (gated on device)
                items.append(items[-1])
            stack = lambda k: jnp.asarray(np.stack([it[k] for it in items]))
            canvases = stack(0)
            sizes = jnp.asarray(np.asarray([it[1] for it in items], np.int32))
            gbs, gls, gvs = stack(2), stack(3), stack(4)
            gms = (
                jnp.asarray(np.stack([it[5] for it in items]))
                if cfg.with_segmentation else None
            )
            viss = stack(6)
            img_valid = jnp.asarray(np.arange(b) < n_real)
            tr = jit_trunk(
                params, online_rpn, anchors, canvases, sizes, gbs, gvs
            )
            state = jit_chunks_acc(
                state, keys[lo // b], *tr, anchors, viss, sizes,
                gbs, gls, gvs, gms, img_valid,
            )

    dt = time.time() - t0
    logger.info("harvest done: %d images in %.1fs (%.1f img/s)",
                n_images, dt, n_images / max(dt, 1e-9))
    teardown_logger("online_detection_tpu.harvest")
    _write_result(
        output_dir,
        "Detector's features extracted in: {}min:{}s \n".format(
            int(dt / 60), round(dt % 60)
        ),
    )
    meta = {
        "extraction_time": dt,
        "average_recall": float(state.ar_sum / jnp.maximum(state.n_images, 1)),
    }
    # AR over the harvested stream (``feature_proposal_extractor.py:308-313``)
    _write_result(
        output_dir,
        "Average Recall (AR): {} \n \n".format(meta["average_recall"]),
    )
    # never truncate silently: per-image chunk caps + saturated reservoirs
    trunc = {"harvest": int(state.harvest_dropped)}
    for name in ("rpn_pos", "rpn_neg", "det_pos", "det_neg", "det_coxy",
                 "mask_pos", "mask_neg"):
        pool = getattr(state, name)
        if pool is not None:
            trunc[name] = pool.dropped()
    trunc["total"] = sum(trunc.values())
    meta["truncation"] = trunc
    if trunc["total"] > 0:
        import logging

        logging.getLogger("online_detection_tpu.harvest").warning(
            "fixed-capacity truncation during device harvest: %s", trunc
        )
        _write_result(output_dir, "truncated: {} \n".format(trunc))
    return state, meta


def train_online_modules_device(
    key: jax.Array,
    state,
    cfg: OnlineTrainConfig,
    output_dir: Optional[str] = None,
    mesh=None,
    axis_name: str = "mb",
) -> OnlineModelSet:
    """Solver stages straight from the HBM reservoirs.

    ``state``: a DeviceReservoirs, or a ONE-ELEMENT LIST holding one — the
    list form transfers ownership so each reservoir is RELEASED as its stage
    consumes it. At flagship scale (M=1000, 10x2000 pools, 21+15+21 heads)
    the reservoirs plus solver working sets exceed a 16 GB chip unless
    freed stage-by-stage; the CLIs use the list form.

    ``mesh``: optional 1-D device mesh — each head's minibootstrap trains
    class-sharded across the devices (SURVEY.md §2.2: the class axis is the
    mesh axis), with the same unrolled production program, stats-inside
    z-scoring, and per-DEVICE class chunking as single-chip.
    """
    if isinstance(state, list):
        state = state.pop()  # take the only reference
    from online_detection_tpu.utils.telemetry import (
        device_memory_mb,
        setup_logger,
        teardown_logger,
    )

    teardown_logger("online_detection_tpu.train")  # fresh handlers per run
    logger = setup_logger("online_detection_tpu.train", output_dir)

    def _log_mem(stage):
        mem = device_memory_mb()
        if mem:
            logger.info("%s: %.0f MB HBM in use", stage, mem)
        else:  # platform without memory_stats: at least mark stage progress
            logger.info("%s", stage)

    _k_unused, k_stats, k_rpn, k_det, k_seg = jax.random.split(key, 5)
    _log_mem("train start")

    online_rpn = None
    if cfg.with_rpn and state.rpn_neg is not None:
        pos = state.rpn_pos.rows
        pos_valid = state.rpn_pos.valid_mask()
        stats_rpn = dacc.device_feature_stats_pool(
            jax.random.fold_in(k_stats, 0), state.rpn_pos, state.rpn_neg,
            pos_fraction=cfg.pos_fraction_feat_stats,
        )
        t0 = time.time()
        models = _train_head_chunked(
            k_rpn, state.rpn_neg, pos, pos_valid,
            MinibootstrapParams(
                m=cfg.rpn_m, sigma=cfg.rpn_sigma, lam=cfg.rpn_lam,
                hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
            ),
            stats_rpn, cfg.iterations, cfg.batch_size,
            "shuffle" if cfg.rpn_shuffle_negatives else "interleave",
            cfg.solver_class_chunk, mesh=mesh, axis_name=axis_name,
        )
        state = state._replace(rpn_neg=None)
        _write_result(
            output_dir,
            "RPN's Online Classifier training time: {}min:{}s \n".format(
                int((time.time() - t0) / 60), round((time.time() - t0) % 60)
            ),
        )
        # RPN COXY: positives' aligned targets; class = anchor index (0-based)
        t0 = time.time()
        a_cls = pos.shape[0]
        cls1 = jnp.broadcast_to(
            jnp.arange(1, a_cls + 1)[:, None], pos_valid.shape
        ).reshape(-1)
        rls = rls_fit_grouped(
            zscore(pos, stats_rpn).reshape(-1, pos.shape[-1]),
            state.rpn_coxy_y.rows.reshape(-1, 4),
            cls1,
            pos_valid.reshape(-1).astype(jnp.float32),
            a_cls,
            cfg.rpn_reg_lam,
            device_solve=True,
            mesh=mesh, axis_name=axis_name,
        )
        _write_result(
            output_dir,
            "RPN's Online Region Refiner training time: {}min:{}s \n".format(
                int((time.time() - t0) / 60), round((time.time() - t0) % 60)
            ),
        )
        online_rpn = OnlineRPNModels(falkon=models, rls=rls, stats=stats_rpn)
        state = state._replace(rpn_pos=None, rpn_coxy_y=None)
        pos = pos_valid = None
        _log_mem("after O-RPN stage")

    # ---- detector ----
    packed = state.det_coxy.rows[0]  # [cap, d+5]
    d = packed.shape[1] - 5
    coxy_x = packed[:, :d]
    coxy_y = packed[:, d : d + 4]
    coxy_c = packed[:, d + 4]
    coxy_valid = state.det_coxy.valid_mask()[0]

    if cfg.use_only_gt_positives_detection:
        det_pos_pool = state.det_pos
        pos = det_pos_pool.rows
        pos_valid = det_pos_pool.valid_mask()
    else:
        # positives from COXY rows, grouped by class on device
        from online_detection_tpu.engine.harvest import compact

        cap_per_class = state.det_pos.rows.shape[1]
        frac = cfg.sampling_ratio_positives_detection

        def per_class(key_c, c):
            m = coxy_valid & (coxy_c.astype(jnp.int32) == c + 1)
            if frac < 1.0:
                # random subset WITHOUT replacement (load_positives_from_COXY
                # samples_fraction, ``py_od_utils.py:232``): rank the valid
                # rows by a uniform draw, keep the floor(n*frac) smallest
                r = jnp.where(m, jax.random.uniform(key_c, m.shape), 2.0)
                rank = jnp.argsort(jnp.argsort(r))
                n_keep = jnp.floor(jnp.sum(m) * frac).astype(jnp.int32)
                m = m & (rank < n_keep)
            idx, valid = compact(m, cap_per_class)
            return coxy_x[idx], valid

        pos, pos_valid = jax.vmap(per_class)(
            jax.random.split(jax.random.fold_in(k_stats, 7), cfg.num_classes),
            jnp.arange(cfg.num_classes),
        )
        det_pos_pool = dacc.Pool(
            rows=pos, counts=jnp.sum(pos_valid, axis=1).astype(jnp.int32)
        )

    stats_det = dacc.device_feature_stats_pool(
        jax.random.fold_in(k_stats, 1), det_pos_pool, state.det_neg,
        pos_fraction=cfg.pos_fraction_feat_stats,
    )

    t0 = time.time()
    reg_x = zscore(coxy_x, stats_det) if cfg.normalize_features_regressor_detector else coxy_x
    det_rls = rls_fit_grouped(
        reg_x, coxy_y, coxy_c, coxy_valid.astype(jnp.float32),
        cfg.num_classes, cfg.det_reg_lam, device_solve=True,
        mesh=mesh, axis_name=axis_name,
    )
    _write_result(
        output_dir,
        "Detector's Online Region Refiner training time: {}min:{}s \n \n".format(
            int((time.time() - t0) / 60), round((time.time() - t0) % 60)
        ),
    )

    t0 = time.time()
    det_falkon = _train_head_chunked(
        k_det, state.det_neg, pos, pos_valid,
        MinibootstrapParams(
            m=cfg.det_m, sigma=cfg.det_sigma, lam=cfg.det_lam,
            hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
        ),
        stats_det, cfg.iterations, cfg.batch_size,
        "shuffle" if cfg.shuffle_negatives else "interleave",
        cfg.solver_class_chunk, mesh=mesh, axis_name=axis_name,
    )
    pos = pos_valid = det_pos_pool = None
    state = state._replace(det_neg=None, det_pos=None, det_coxy=None)
    packed = coxy_x = coxy_y = coxy_c = reg_x = None
    _log_mem("after detector stage")
    _write_result(
        output_dir,
        "Detector's Online Classifier training time: {}min:{}s \n".format(
            int((time.time() - t0) / 60), round((time.time() - t0) % 60)
        ),
    )
    online_det = OnlineDetectorModels(falkon=det_falkon, rls=det_rls, stats=stats_det)

    # ---- segmentation ----
    online_mask = None
    if cfg.with_segmentation and state.mask_pos is not None:
        seg_iters = max(
            1,
            int(np.ceil(state.mask_neg.rows.shape[1] / cfg.segm_batch_size)),
        )
        pos_rows = state.mask_pos.rows
        pos_valid = state.mask_pos.valid_mask()
        stats_seg = dacc.device_feature_stats_pool(
            jax.random.fold_in(k_stats, 2), state.mask_pos, state.mask_neg,
            pos_fraction=cfg.pos_fraction_feat_stats,
        )
        t0 = time.time()
        seg_falkon = _train_head_chunked(
            k_seg, state.mask_neg, pos_rows, pos_valid,
            MinibootstrapParams(
                m=cfg.segm_m, sigma=cfg.segm_sigma, lam=cfg.segm_lam,
                hard_thresh=cfg.hard_thresh, easy_thresh=cfg.easy_thresh,
            ),
            stats_seg, seg_iters, cfg.segm_batch_size, "arrival",
            cfg.solver_class_chunk, mesh=mesh, axis_name=axis_name,
        )
        state = state._replace(mask_pos=None, mask_neg=None)
        _write_result(
            output_dir,
            "Online Segmentation training time: {}min:{}s \n".format(
                int((time.time() - t0) / 60), round((time.time() - t0) % 60)
            ),
        )
        online_mask = OnlineMaskModels(falkon=seg_falkon, stats=stats_seg)
        _log_mem("after segmentation stage")

    teardown_logger("online_detection_tpu.train")
    return OnlineModelSet(rpn=online_rpn, detector=online_det, mask=online_mask)
