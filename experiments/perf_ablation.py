#!/usr/bin/env python
"""Per-stage wall-clock ablation of the batched inference program.

Times truncated versions of ``models/detector.detect`` (vmapped at canvas
batch 8, 608x800) on the real TPU; the delta between consecutive variants is
the wall cost of the stage added.  Used to direct MXU-utilization work: the
bench reports 22-28% MFU for the full program and this tool says which stage
eats the non-MXU time (reference has no analog — its per-stage picture is
the per-image Python loop timings in ``engine/inference.py:281-309``).

Output: one JSON line per variant ``{"stage": ..., "ms_per_img": ...,
"delta_ms": ...}`` plus a compile-seconds field.

Usage: python experiments/perf_ablation.py [--batch 8] [--reps 4]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--stages", type=str, default="",
                    help="comma-separated subset of stage names to run")
    ap.add_argument("--mode", choices=("inference", "harvest"),
                    default="inference")
    args = ap.parse_args()
    if args.mode == "harvest":
        return harvest_ablation(args)

    import jax
    import jax.numpy as jnp

    from online_detection_tpu.utils.compile_cache import (
        default_cache_dir, guard_fingerprint,
    )

    cache = default_cache_dir()
    guard_fingerprint(cache)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from online_detection_tpu.data.transforms import normalize_canvas
    from online_detection_tpu.models import resnet
    from online_detection_tpu.models.anchors import grid_anchors
    from online_detection_tpu.models.detector import (
        DetectorConfig, OnlineModelSet, init_detector_params,
    )
    from online_detection_tpu.models.heads import (
        OnlineDetectorModels, OnlineMaskModels, box_predict, mask_deconv,
        mask_predict,
    )
    from online_detection_tpu.models.postprocess import (
        postprocess_detections, select_mask_channel,
    )
    from online_detection_tpu.models.rpn import (
        OnlineRPNModels, propose, rpn_features, rpn_online,
    )
    from online_detection_tpu.ops.roi_align import roi_align
    from online_detection_tpu.solvers.falkon import FalkonModel
    from online_detection_tpu.solvers.rls import RLSModel
    from online_detection_tpu.utils.stats import FeatureStats

    bsz, hh, ww = args.batch, 608, 800
    cfg = DetectorConfig()
    rng = np.random.default_rng(0)
    params = init_detector_params(jax.random.key(0), 15, 22)
    anchors = jnp.asarray(grid_anchors(hh // 16, ww // 16))
    canv = jnp.asarray(rng.integers(0, 255, (bsz, hh, ww, 3), dtype=np.uint8))
    sizes = jnp.broadcast_to(jnp.asarray([ww, hh]), (bsz, 2))

    def dev_normal(seed, shape, scale=1.0):
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32) * scale
        )(jax.random.key(seed))

    def falkon(seed, c, mm, d, sigma):
        return FalkonModel(dev_normal(seed, (c, mm, d)),
                           dev_normal(seed + 1, (c, mm), 0.01),
                           jnp.ones((c,), bool), sigma)

    def rls(seed, c, d):
        eye = jnp.broadcast_to(jnp.eye(4), (c, 4, 4))
        return RLSModel(dev_normal(seed, (c, d + 1, 4), 1e-4), eye, eye,
                        jnp.zeros((c, 4)), jnp.ones((c,), bool),
                        jnp.zeros((c, 4)))

    def stats(d):
        return FeatureStats(jnp.zeros((d,)), jnp.ones((d,)), jnp.asarray(20.0))

    online = OnlineModelSet(
        rpn=OnlineRPNModels(falkon(400, 15, 1000, 1024, 50.0),
                            rls(402, 15, 1024), stats(1024)),
        detector=OnlineDetectorModels(falkon(404, 21, 1000, 2048, 15.0),
                                      rls(406, 21, 2048), stats(2048)),
        mask=OnlineMaskModels(falkon(408, 21, 500, 256, 10.0), stats(256)),
    )

    # --- truncated single-image programs, each strictly extending the last ---
    def upto(stage):
        def one(p, o, a, im, sz):
            from online_detection_tpu.models.detector import resolve_compute_dtype
            im = normalize_canvas(im).astype(resolve_compute_dtype(cfg))
            c4 = resnet.backbone_c4(p["backbone"], im[None])
            if stage == "backbone":
                return c4
            t = rpn_features(p["rpn"], c4)[0]
            sc, dl = rpn_online(o.rpn, t)
            sc, dl = sc.reshape(-1), dl.reshape(-1, 4)
            if stage == "rpn_head":
                return sc, dl
            pb, ps, pv = propose(
                sc, dl, a, sz, pre_nms_top_n=cfg.pre_nms_top_n,
                post_nms_top_n=cfg.post_nms_top_n,
                nms_thresh=cfg.rpn_nms_thresh, min_size=cfg.rpn_min_size,
            )
            if stage == "propose":
                return pb, ps
            pooled = roi_align(c4[0], pb, cfg.pooler_resolution,
                               cfg.pooler_resolution, cfg.pooler_scale,
                               roi_chunk=cfg.roi_chunk)
            if stage == "roi_align":
                return pooled
            feats = resnet.res5_head(p["backbone"], pooled)
            if stage == "res5":
                return feats
            cls_scores, box_deltas = box_predict(o.detector, feats, False)
            if stage == "box_predict":
                return cls_scores, box_deltas
            dets = postprocess_detections(
                pb, pv, cls_scores, box_deltas, sz,
                score_thresh=cfg.score_thresh, nms_thresh=cfg.nms_thresh,
                detections_per_img=cfg.detections_per_img,
            )
            if stage == "postprocess":
                return dets
            pooled2 = roi_align(c4[0], dets.boxes, cfg.pooler_resolution,
                                cfg.pooler_resolution, cfg.pooler_scale,
                                roi_chunk=cfg.roi_chunk)
            res5m = resnet.res5_feature_map(p["backbone"], pooled2)
            if stage == "mask_res5":
                return res5m
            dcv = mask_deconv(p["mask_head"], res5m)
            px = mask_predict(o.mask, dcv)
            return dets, select_mask_channel(px, dets.labels)

        batched = jax.vmap(one, in_axes=(None, None, None, 0, 0))

        def reduced(p, o, a, im, sz):
            # fetch a scalar, not the stage output: the axon host link runs
            # at ~0.1-12 MB/s, so device_get of a 62 MB backbone output would
            # dominate the timing (it did, before this reduction)
            out = batched(p, o, a, im, sz)
            leaves = [x.astype(jnp.float32).sum()
                      for x in jax.tree_util.tree_leaves(out)]
            return sum(leaves)

        return jax.jit(reduced)

    stages = ["backbone", "rpn_head", "propose", "roi_align", "res5",
              "box_predict", "postprocess", "mask_res5", "full",
              "full_batched"]
    if args.stages:
        keep = set(args.stages.split(","))
        stages = [s for s in stages if s in keep]

    def batched_program():
        # the production program: detect_batched (rowwise head stages
        # flattened across the image batch; models/detector.py)
        from online_detection_tpu.models.detector import detect_batched

        def reduced(p, o, a, im, sz):
            out = detect_batched(p, o, a, im, sz, cfg, True)
            return sum(x.astype(jnp.float32).sum()
                       for x in jax.tree_util.tree_leaves(out))

        return jax.jit(reduced)

    prev_ms = 0.0
    for stage in stages:
        fn = batched_program() if stage == "full_batched" else upto(stage)
        t0 = time.perf_counter()
        jax.device_get(fn(params, online, anchors, canv, sizes))
        compile_s = time.perf_counter() - t0

        # Slope timing: the final device_get pays one tunnel round trip
        # (~15-20 ms, measured), which at 4 reps x batch 8 inflated every
        # stage by ~0.5 ms/img — the old per-stage absolutes carried it
        # even though stage DELTAS cancelled it. Timing the same trial at
        # reps and 3*reps and taking the slope removes any constant
        # overhead exactly. best-of-3 on each leg: the chip is shared
        # behind the tunnel; a single window can absorb unrelated stalls
        # (one raw run read res5 at 16 ms/img where an adjacent run
        # read 3).
        def trial(reps):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(reps):
                    out = fn(params, online, anchors, canv, sizes)
                jax.device_get(out)
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = trial(args.reps), trial(3 * args.reps)
        ms = max(t_hi - t_lo, 0.0) / (2 * args.reps) / bsz * 1e3
        print(json.dumps({
            "stage": stage, "ms_per_img": round(ms, 2),
            "delta_ms": round(ms - prev_ms, 2),
            "sync_ms": round((t_lo - (t_hi - t_lo) / 2) * 1e3, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        prev_ms = ms


def harvest_ablation(args):
    """Per-stage ablation of the batched HARVEST program pair.

    The production device pipeline dispatches two programs per canvas batch
    (``_jit_batched_trunk`` then ``_jit_batched_chunks_accumulate``); this
    times truncated compositions so the deltas isolate the conv trunk, each
    sampling head (detector / RPN / mask), and the reservoir fold:

        trunk            conv trunk only (backbone..res5 + GT-row deconv)
        chunks_det       + detector sampling (IoU table, pools, COXY)
        chunks_det_rpn   + RPN sampling (anchor matching, per-anchor pools)
        chunks_all       + mask pixel sampling
        full             + reservoir accumulate scan (the production pair)
    """
    import jax
    import jax.numpy as jnp

    from online_detection_tpu.utils.compile_cache import (
        default_cache_dir, guard_fingerprint,
    )

    cache = default_cache_dir()
    guard_fingerprint(cache)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from online_detection_tpu.engine import device_accumulate as dacc
    from online_detection_tpu.engine.harvest import (
        HarvestConfig, harvest_chunks,
    )
    from online_detection_tpu.models.anchors import (
        anchor_visibility, grid_anchors,
    )
    from online_detection_tpu.models.detector import (
        DetectorConfig, init_detector_params,
    )
    from online_detection_tpu.pipelines.device_pipeline import (
        _jit_batched_chunks_accumulate, _jit_batched_trunk,
    )

    bsz, hh, ww, gt_cap = args.batch, 608, 800, 8
    dcfg = DetectorConfig()
    hcfg = HarvestConfig(negatives_to_pick=64, gt_cap=gt_cap)
    rng = np.random.default_rng(0)
    params = init_detector_params(jax.random.key(0), 15, 22)
    anchors = jnp.asarray(grid_anchors(hh // 16, ww // 16))
    vis = jnp.asarray(
        np.broadcast_to(
            anchor_visibility(np.asarray(anchors), (ww, hh)),
            (bsz, anchors.shape[0]),
        ).copy()
    )
    canv = jnp.asarray(rng.integers(0, 255, (bsz, hh, ww, 3), dtype=np.uint8))
    sizes = jnp.broadcast_to(jnp.asarray([ww, hh]), (bsz, 2))
    gb = jnp.asarray(
        np.tile(np.array([[10, 10, 200, 200]] * gt_cap, np.float32),
                (bsz, 1, 1))
    )
    gl = jnp.ones((bsz, gt_cap), jnp.int32)
    gv = jnp.ones((bsz, gt_cap), bool)
    gm = jnp.ones((bsz, gt_cap, 14, 14), jnp.float32)
    img_valid = jnp.ones((bsz,), bool)
    keys = jax.random.split(jax.random.key(1), bsz)

    jt = _jit_batched_trunk(dcfg, True, None, "mb")

    def reduce_leaves(out):
        return sum(
            x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(out)
        )

    def chunks_fn(with_rpn, with_mask):
        def one(k, t, pb, pv, f, dc):
            return harvest_chunks(
                k, t, pb, pv, f, dc if with_mask else None, anchors, vis[0],
                sizes[0], gb[0], gl[0], gv[0], gm[0] if with_mask else None,
                hcfg, with_rpn=with_rpn,
            )

        @jax.jit
        def run(params, canv):
            tr = jt(params, None, anchors, canv, sizes, gb, gv)
            out = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0))(keys, *tr)
            return reduce_leaves(out)

        return run

    @jax.jit
    def trunk_only(params, canv):
        return reduce_leaves(jt(params, None, anchors, canv, sizes, gb, gv))

    jca = _jit_batched_chunks_accumulate(hcfg, True, 21)

    def make_state():
        return dacc.init_reservoirs(
            15, 21, 2000, rpn_pos_cap=1024, det_pos_cap=1024,
            coxy_cap=8000, mask_cap=16000,
            chunk_sizes={"npick": 64, "rpn_pos": hcfg.rpn_pos_cap,
                         "gt_cap": gt_cap, "coxy": hcfg.coxy_cap,
                         "mask_pix": hcfg.mask_pix_cap},
            with_rpn=True, with_mask=True, batch_size=bsz,
        )

    fns = {
        "trunk": lambda: trunk_only(params, canv),
        "chunks_det": lambda f=chunks_fn(False, False): f(params, canv),
        "chunks_det_rpn": lambda f=chunks_fn(True, False): f(params, canv),
        "chunks_all": lambda f=chunks_fn(True, True): f(params, canv),
    }

    # full: the production pair; state is donated, so rebuild it per call
    # OUTSIDE the timed region is impossible — instead thread it like the
    # bench does (timing includes only the per-batch marginal work).
    state_holder = {"st": make_state()}

    def full_fn():
        tr = jt(params, None, anchors, canv, sizes, gb, gv)
        state_holder["st"] = jca(
            state_holder["st"], keys, *tr, anchors, vis, sizes, gb, gl, gv,
            gm, img_valid,
        )
        return state_holder["st"].n_images

    fns["full"] = full_fn

    prev_ms = 0.0
    for stage in ("trunk", "chunks_det", "chunks_det_rpn", "chunks_all",
                  "full"):
        if args.stages and stage not in set(args.stages.split(",")):
            continue
        fn = fns[stage]
        t0 = time.perf_counter()
        jax.device_get(fn())
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = fn()
            jax.device_get(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.reps / bsz * 1e3
        print(json.dumps({
            "stage": stage, "ms_per_img": round(ms, 2),
            "delta_ms": round(ms - prev_ms, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        prev_ms = ms


if __name__ == "__main__":
    main()
