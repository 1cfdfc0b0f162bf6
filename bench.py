#!/usr/bin/env python
"""Headline benchmark: full on-line training step at flagship scale.

Measures the wall-clock of training ALL on-line modules at the flagship
(YCB-Video) configuration on synthetic features resident in HBM:

- detector: 21 FALKON classifiers, M=1000, d=2048, minibootstrap 10x2000
- RPN:      15 per-anchor FALKON classifiers, M=1000, d=1024, 10x2000
- segmentation: 21 per-pixel FALKON classifiers, M=500, d=256, 2x20000
- RLS refiners for detector (lam=1000) and RPN (lam=0.01)

This is the reference's "on-line training time" headline (SURVEY.md §6;
``result.txt`` stage timings). The reference runs the same workload
sequentially per class on one GPU in minutes; ``vs_baseline`` is speedup
against the 120 s the reference's published pipeline budget corresponds to
(paper tables report 2-4 min on-line training on YCB-Video; BASELINE.md —
no in-repo numbers exist, so 120 s is the conservative low end).

Output protocol (round-2 redesign after the round-1 rc=124 timeout): a JSON
line is printed and flushed **the moment each stage is measured**, cheapest
stage first, so a partial run still lands numbers. The LAST line printed is
always the headline ``online_training_time_flagship_scale`` metric — composed
from per-stage sums if the end-to-end sweep had to be skipped on deadline.
Stale persistent-compile-cache entries from a different libtpu build are
detected (fingerprint file) and purged instead of crashing the process.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

BASELINE_SECONDS = 120.0


def _deadline() -> float:
    """Absolute wall deadline, inherited across re-execs via env."""
    if "ODTPU_BENCH_DEADLINE" not in os.environ:
        budget = float(os.environ.get("ODTPU_BENCH_BUDGET", "480"))
        os.environ["ODTPU_BENCH_DEADLINE"] = str(time.time() + budget)
    return float(os.environ["ODTPU_BENCH_DEADLINE"])


def _remaining(deadline: float) -> float:
    return deadline - time.time()


def emit(metric: str, value: float, unit: str, vs_baseline=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 4), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 2)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


# cache hygiene shared with the experiment CLIs (single source of truth for
# the cache location too — a second copy here could guard one directory
# while JAX compiles into another)
from online_detection_tpu.utils.compile_cache import (  # noqa: E402
    default_cache_dir,
    guard_fingerprint as _guard_fingerprint,
    is_stale_cache_error as _is_stale_cache_error,
    purge as _purge_cache_dir,
)

CACHE_DIR = default_cache_dir()


def _purge_cache(reason: str):
    print(f"# bench: purging compile cache ({reason})", file=sys.stderr)
    _purge_cache_dir(CACHE_DIR)


def main():
    deadline = _deadline()
    import jax
    import jax.numpy as jnp

    # a silent CPU fallback (e.g. the chip is claimed by another process at
    # startup) would report flagship numbers hundreds of times slower than
    # the hardware — retry backend init until the chip is free, bounded so
    # the wait cannot eat the whole budget
    if jax.default_backend() != "tpu":
        attempt = int(os.environ.get("ODTPU_BENCH_ATTEMPT", "0"))
        if attempt < 8 and _remaining(deadline) > 120:
            print(
                f"# bench: TPU unavailable (backend={jax.default_backend()}), "
                f"retrying ({attempt})", file=sys.stderr,
            )
            time.sleep(15)
            os.environ["ODTPU_BENCH_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise SystemExit("bench: no TPU backend after retries")
    print(f"# bench backend: {jax.default_backend()}", file=sys.stderr)
    _guard_fingerprint(CACHE_DIR)
    # persistent compile cache: the flagship programs cost ~15-150 s of
    # (remote) compile each; with the fingerprint guard above, reusing them
    # across runs is safe and makes repeat benches compile-free
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from online_detection_tpu.ops.gaussian_mmv import mmv
    from online_detection_tpu.solvers.minibootstrap import (
        MinibootstrapParams,
        train_classifiers_minibootstrap,
    )
    from online_detection_tpu.solvers.rls import rls_fit_grouped

    rng = np.random.default_rng(0)

    def dev_normal(key, shape, shift=0.0):
        """Synthetic data generated ON DEVICE. Uploading NumPy buffers would
        dominate the bench on the tunneled dev chip (~12 MB/s host link: the
        860 MB segmentation pool alone costs ~70 s; production PCIe makes
        this a non-issue, but the bench must not measure the tunnel)."""
        return jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.float32) + shift
        )(jax.random.key(key))

    def timed(fn):
        """(setup seconds = compile + any input upload, warm-run seconds).

        Completion is forced with ``jax.device_get`` — on the remote axon
        platform ``block_until_ready`` returns before the computation
        finishes, which round-2 probing showed inflates throughput numbers
        ~50x. Outputs here are KB-scale, so the fetch cost is noise.
        """
        t0 = time.perf_counter()
        jax.device_get(fn())
        t1 = time.perf_counter()
        jax.device_get(fn())
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    stage_times = {}  # warm wall-clock per stage, summed into the headline

    # ---- stage 1: fused Gaussian-kernel mmv (the inference primitive) ----
    x_mmv = dev_normal(101, (20000, 2048))
    c_mmv = dev_normal(102, (1000, 2048))
    a_mmv = dev_normal(103, (1000,))
    jax.device_get(mmv(x_mmv, c_mmv, a_mmv, 15.0))  # compile + warm
    reps = 50  # amortize the tunnel round-trip out of the per-call number
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = mmv(x_mmv, c_mmv, a_mmv, 15.0)
    jax.device_get(out)
    warm_s = (time.perf_counter() - t0) / reps
    flops = 2.0 * 20000 * 1000 * 2048
    emit("gaussian_mmv_20k_x_1000_d2048", warm_s * 1e3, "ms",
         vs_baseline=None, gflops=round(flops / warm_s / 1e9, 1), reps=reps)

    # ---- stage 2: grouped RLS refiners (device Cholesky solve) ----
    def rls_stage(n_cls, d, lam, name):
        xs = dev_normal(200 + n_cls, (n_cls * 1000, d))
        ys = dev_normal(210 + n_cls, (n_cls * 1000, 4))
        cs = jnp.repeat(jnp.arange(1, n_cls + 1, dtype=jnp.float32), 1000)
        ws = jnp.ones((n_cls * 1000,))
        thunk = lambda: rls_fit_grouped(
            xs, ys, cs, ws, n_cls, lam, device_solve=True
        ).beta
        compile_s, warm_s = timed(thunk)
        emit(name, warm_s, "s", setup_s=round(compile_s, 2))
        stage_times[name] = warm_s
        return thunk

    rls_det_thunk = rls_rpn_thunk = None
    if _remaining(deadline) > 60:
        rls_det_thunk = rls_stage(21, 2048, 1000.0, "rls_fit_detector_21x1000")
    if _remaining(deadline) > 45:
        rls_rpn_thunk = rls_stage(15, 1024, 0.01, "rls_fit_rpn_15x1000")

    # ---- stages 3-5: per-head FALKON minibootstrap ----
    # pools are (re)generated on demand and FREED between stages: keeping the
    # ~6 GB of head data resident through the throughput stage starves the
    # batch sweep of HBM (b32 RESOURCE_EXHAUSTED with them live)
    def mk(seed, c, p, i, b, d):
        pos = dev_normal(seed, (c, p, d), shift=0.5)
        neg = dev_normal(seed + 1, (c, i, b, d), shift=-0.5)
        return pos, jnp.ones((c, p), bool), neg, jnp.ones((c, i, b), bool)

    head_specs = [
        ("minibootstrap_segm_21cls_m500", 300, (21, 2000, 2, 20000, 256),
         MinibootstrapParams(m=500, sigma=10.0, lam=1e-6)),
        ("minibootstrap_rpn_15anchors_m1000", 310, (15, 500, 10, 2000, 1024),
         MinibootstrapParams(m=1000, sigma=50.0, lam=1e-3)),
        ("minibootstrap_detector_21cls_m1000", 320, (21, 500, 10, 2000, 2048),
         MinibootstrapParams(m=1000, sigma=15.0, lam=1e-5)),
    ]

    def head_thunk(seed, dims, params):
        data = mk(seed, *dims)
        return lambda: train_classifiers_minibootstrap(
            jax.random.key(0), *data, params
        ).alpha

    measured_heads = []

    def run_minibootstrap_stages():
        # deferred until AFTER the throughput stages: these programs'
        # ~120 MB unrolled executables take 35-65 s each to ship over the
        # tunnel even on a cache hit (BASELINE.md), and a slow-link run must
        # not starve the throughput stages of budget — the headline composes
        # from whatever lands, with vs_baseline guarded on completeness
        for name, seed, dims, params in head_specs:
            if _remaining(deadline) < 45:
                print(f"# bench: skipping {name} (deadline)", file=sys.stderr)
                continue
            thunk = head_thunk(seed, dims, params)
            compile_s, warm_s = timed(thunk)
            emit(name, warm_s, "s", setup_s=round(compile_s, 2))
            stage_times[name] = warm_s
            measured_heads.append((name, seed, dims, params))
            del thunk  # frees this head's pools before the next stage

    # ---- stage 3: harvest throughput (batched trunk + chunks + reservoirs) ----
    if _remaining(deadline) <= 120:
        print(f"# bench: skipping throughput stages "
              f"(deadline, {_remaining(deadline):.0f}s left)", file=sys.stderr)
    else:
        try:
            from online_detection_tpu.engine.harvest import HarvestConfig
            from online_detection_tpu.models.anchors import (
                anchor_visibility,
                grid_anchors,
            )
            from online_detection_tpu.models.detector import (
                DetectorConfig,
                init_detector_params,
            )
            from online_detection_tpu.engine import device_accumulate as dacc
            from online_detection_tpu.pipelines.device_pipeline import (
                _jit_batched_chunks_accumulate,
                _jit_batched_trunk,
            )

            bsz, hh, ww, gt_cap = 8, 608, 800, 8
            dcfg = DetectorConfig()
            hcfg = HarvestConfig(negatives_to_pick=64, gt_cap=gt_cap)
            params = init_detector_params(jax.random.key(0), 15, 22)
            anchors = jnp.asarray(grid_anchors(hh // 16, ww // 16))
            vis = jnp.asarray(
                np.broadcast_to(
                    anchor_visibility(np.asarray(anchors), (ww, hh)),
                    (bsz, anchors.shape[0]),
                ).copy()
            )
            canv = jnp.asarray(
                rng.integers(0, 255, size=(bsz, hh, ww, 3), dtype=np.uint8)
            )
            sizes = jnp.broadcast_to(jnp.asarray([ww, hh]), (bsz, 2))
            gb = jnp.asarray(
                np.tile(np.array([[10, 10, 200, 200]] * gt_cap, np.float32),
                        (bsz, 1, 1))
            )
            gl = jnp.ones((bsz, gt_cap), jnp.int32)
            gv = jnp.ones((bsz, gt_cap), bool)
            gm = jnp.ones((bsz, gt_cap, 14, 14), jnp.float32)
            img_valid = jnp.ones((bsz,), bool)
            # modest reservoir caps: throughput does not depend on pool size,
            # and the solver stages' multi-GB buffers are still HBM-resident
            state = dacc.init_reservoirs(
                15, 21, 2000, rpn_pos_cap=1024, det_pos_cap=1024,
                coxy_cap=8000, mask_cap=16000,
                chunk_sizes={"npick": 64, "rpn_pos": hcfg.rpn_pos_cap,
                             "gt_cap": gt_cap, "coxy": hcfg.coxy_cap,
                             "mask_pix": hcfg.mask_pix_cap},
                with_rpn=True, with_mask=True, batch_size=bsz,
            )
            jt = _jit_batched_trunk(dcfg, True, None, "mb")
            jca = _jit_batched_chunks_accumulate(hcfg, True, 21)
            keys = jax.random.split(jax.random.key(1), bsz)

            def harvest_batch(st):
                tr = jt(params, None, anchors, canv, sizes, gb, gv)
                return jca(st, keys, *tr, anchors, vis, sizes, gb, gl, gv,
                           gm, img_valid)

            from online_detection_tpu.utils import flops as F

            harvest_gflops = F.harvest_image_flops(
                hh, ww, n_props=dcfg.post_nms_top_n, n_gt=gt_cap
            ) / 1e9
            state = harvest_batch(state)  # compile + warm
            jax.device_get(state.n_images)
            # 12 batches per trial: at 4, the per-dispatch tunnel round-trip
            # (~24 ms unpipelined, ~0.5-1.5 ms amortized; measured with a
            # scalar no-op at reps 1/16/64) still pollutes the per-image
            # number by ~0.7 ms/img; 12 pipelined dispatches push the
            # overhead under ~2%
            n_batches = 12
            # best-of-3 trials: the chip is shared behind a tunnel and a
            # single 4-rep window can absorb unrelated stalls (one run read
            # 92 imgs/s where an isolated probe reads 105)
            best_dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_batches):
                    state = harvest_batch(state)
                jax.device_get(state.n_images)
                best_dt = min(best_dt, time.perf_counter() - t0)
            ips = bsz * n_batches / best_dt
            emit("harvest_throughput_600px", ips, "imgs/s", batch=bsz,
                 gflops_per_img=round(harvest_gflops, 1),
                 tflops=round(ips * harvest_gflops / 1e3, 1),
                 mfu=round(F.mfu(ips * harvest_gflops * 1e9), 3))
            del state  # release reservoirs before the inference stage

            # ---- inference throughput (the serving path) ----
            from online_detection_tpu.models.heads import (
                OnlineDetectorModels,
                OnlineMaskModels,
            )
            from online_detection_tpu.models.rpn import OnlineRPNModels
            from online_detection_tpu.models.detector import OnlineModelSet
            from online_detection_tpu.pipelines.online_pipeline import (
                _jit_detect_batched,
            )
            from online_detection_tpu.solvers.falkon import FalkonModel
            from online_detection_tpu.solvers.rls import RLSModel
            from online_detection_tpu.utils.stats import FeatureStats

            def falkon(seed, c, mm, d, sigma):
                return FalkonModel(
                    dev_normal(seed, (c, mm, d)),
                    dev_normal(seed + 1, (c, mm)) * 0.01,
                    jnp.ones((c,), bool), sigma,
                )

            def rls(seed, c, d):
                eye = jnp.broadcast_to(jnp.eye(4), (c, 4, 4))
                return RLSModel(dev_normal(seed, (c, d + 1, 4)) * 1e-4,
                                eye, eye, jnp.zeros((c, 4)),
                                jnp.ones((c,), bool), jnp.zeros((c, 4)))

            def stats(d):
                return FeatureStats(jnp.zeros((d,)), jnp.ones((d,)),
                                    jnp.asarray(20.0))

            online = OnlineModelSet(
                rpn=OnlineRPNModels(falkon(400, 15, 1000, 1024, 50.0),
                                    rls(402, 15, 1024), stats(1024)),
                detector=OnlineDetectorModels(falkon(404, 21, 1000, 2048, 15.0),
                                              rls(406, 21, 2048), stats(2048)),
                mask=OnlineMaskModels(falkon(408, 21, 500, 256, 10.0),
                                      stats(256)),
            )
            infer_gflops = F.inference_image_flops(
                hh, ww, n_props=dcfg.post_nms_top_n,
                n_det=dcfg.detections_per_img,
            ) / 1e9

            def run_inference_batch(b):
                """imgs/s at canvas batch b (tail sweep reuses the batch-8
                canvases by tiling — data is synthetic). Batch >= 16 chunks
                the RoIAlign intermediate (DetectorConfig.roi_chunk) — flat
                vmap OOMs HBM at batch 32."""
                cv = jnp.tile(canv, (max(1, b // bsz), 1, 1, 1))[:b]
                sz = jnp.broadcast_to(jnp.asarray([ww, hh]), (b, 2))
                cfg_b = dcfg if b < 32 else dcfg._replace(roi_chunk=100)
                jd = _jit_detect_batched(cfg_b, True, False)
                out = jd(params, online, anchors, cv, sz)
                jax.device_get(out[0].scores)  # compile + warm
                best_dt = float("inf")
                for _ in range(3):  # best-of-3 (see harvest stage note)
                    t0 = time.perf_counter()
                    for _ in range(n_batches):
                        out = jd(params, online, anchors, cv, sz)
                    jax.device_get(out[0].scores)
                    best_dt = min(best_dt, time.perf_counter() - t0)
                return b * n_batches / best_dt

            ips = run_inference_batch(bsz)
            emit("inference_throughput_600px", ips, "imgs/s", batch=bsz,
                 gflops_per_img=round(infer_gflops, 1),
                 tflops=round(ips * infer_gflops / 1e3, 1),
                 mfu=round(F.mfu(ips * infer_gflops * 1e9), 3))

            # batch-1 serving latency: the reference's own operating point
            # (TEST.IMS_PER_BATCH: 1 in every experiment config) — the
            # number a latency-sensitive deployment compares first.
            if _remaining(deadline) > 150:
                try:
                    ips1 = run_inference_batch(1)
                    emit("inference_latency_600px_b1", 1e3 / ips1, "ms",
                         batch=1,
                         mfu=round(F.mfu(ips1 * infer_gflops * 1e9), 3))
                except Exception as e:
                    print(f"# bench: batch-1 latency failed: {e!r}",
                          file=sys.stderr)

            # batch-knee sweep (VERDICT round 1, missing #6): where does the
            # imgs/s curve flatten? Each extra batch size costs one compile.
            for b_sweep in (16, 32):
                if _remaining(deadline) < 150:
                    print(f"# bench: skipping batch-{b_sweep} sweep (deadline)",
                          file=sys.stderr)
                    break
                try:
                    ips_b = run_inference_batch(b_sweep)
                    emit(f"inference_throughput_600px_b{b_sweep}", ips_b,
                         "imgs/s", batch=b_sweep,
                         tflops=round(ips_b * infer_gflops / 1e3, 1),
                         mfu=round(F.mfu(ips_b * infer_gflops * 1e9), 3))
                except Exception as e:  # e.g. HBM pressure at batch 32
                    print(f"# bench: batch-{b_sweep} sweep failed: {e!r}",
                          file=sys.stderr)
                    break
            del online, params, canv  # release HBM before the headline
        except Exception as e:  # never let the throughput stage kill the bench
            print(f"# bench: harvest stage failed: {e!r}", file=sys.stderr)

    # ---- stages 4-6: per-head FALKON minibootstrap (deferred; see above) --
    run_minibootstrap_stages()

    # ---- headline: the full on-line training step ----
    complete = len(stage_times) == 5
    headline_done = False
    if complete and _remaining(deadline) > 2.5 * sum(stage_times.values()) + 10:
        # everything is compiled — regenerate the pools (freed before the
        # throughput stage) and run one timed end-to-end sweep
        try:
            head_thunks = [
                head_thunk(seed, dims, params)
                for _name, seed, dims, params in measured_heads
            ]

            def full_training_step():
                outs = [t() for t in head_thunks]
                outs.append(rls_det_thunk())
                outs.append(rls_rpn_thunk())
                jax.device_get(outs)  # force completion (see timed())

            full_training_step()  # warm the regenerated buffers into place
            t0 = time.perf_counter()
            full_training_step()
            dt = time.perf_counter() - t0
            emit("online_training_time_flagship_scale", dt, "s",
                 vs_baseline=BASELINE_SECONDS / dt,
                 baseline_note="assumed 120s floor (papers say minutes; no "
                 "transcribable number in-sandbox) - ratio is a lower bound")
            headline_done = True
        except Exception as e:  # the headline line must ALWAYS be emitted
            print(f"# bench: end-to-end sweep failed ({e!r}); "
                  "falling back to stage sums", file=sys.stderr)
    if not headline_done and stage_times:
        # deadline hit: headline = sum of the measured warm stages (the full
        # step is their sequential composition). vs_baseline is only claimed
        # when ALL 5 stages landed — a partial sum is not the flagship step
        # and a ratio against it would overstate the speedup.
        dt = sum(stage_times.values())
        emit("online_training_time_flagship_scale", dt, "s",
             vs_baseline=(BASELINE_SECONDS / dt) if complete else None,
             estimated_from_stages=sorted(stage_times),
             complete=complete,
             baseline_note="assumed 120s floor (papers say minutes; no "
             "transcribable number in-sandbox) - ratio is a lower bound")
    elif not headline_done:
        raise SystemExit("bench: no stage completed before the deadline")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # stale AOT entries from a different libtpu build
        if _is_stale_cache_error(e) and "ODTPU_BENCH_PURGED" not in os.environ:
            _purge_cache(f"stale AOT entry: {type(e).__name__}")
            os.environ["ODTPU_BENCH_PURGED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
