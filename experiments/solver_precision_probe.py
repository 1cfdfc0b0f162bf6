"""Measure the minibootstrap solver stages vs ODTPU_SOLVER_PRECISION.

The round-4 quality fix (ops/gaussian_mmv.kernel_precision) defaults the
"solver" role to HIGH (bf16x3). The first full-bench run at the new
defaults measured the segmentation minibootstrap at 1.23 s warm vs 0.11 s
in BENCH_r03 (old single-pass numerics) — far beyond the ~2x the detector
headline measurement suggested — so this probe times each head's
PRODUCTION AOT program per precision setting, one subprocess per setting
(precision is resolved at trace time from the env).

Run on the real TPU:  python experiments/solver_precision_probe.py
One setting (child):  ODTPU_SOLVER_PRECISION=high python ... --one
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one():
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.default_backend() == "tpu", jax.default_backend()
    from online_detection_tpu.utils.compile_cache import default_cache_dir
    jax.config.update("jax_compilation_cache_dir", default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from online_detection_tpu.pipelines.device_pipeline import (
        solver_program_shapes,
    )
    from online_detection_tpu.pipelines.online_pipeline import (
        OnlineTrainConfig,
    )
    from online_detection_tpu.solvers.minibootstrap import (
        train_classifiers_minibootstrap,
        warm_train_program,
    )
    from online_detection_tpu.utils.stats import FeatureStats

    cfg = OnlineTrainConfig(
        shuffle_negatives=True, rpn_shuffle_negatives=True
    )
    shapes = solver_program_shapes(cfg, gt_cap=8, batch_size=8)
    setting = os.environ.get("ODTPU_SOLVER_PRECISION", "<role default>")
    rng = np.random.default_rng(0)
    # SMALLEST head first and one JSON line per head, flushed immediately —
    # a slow-tunnel day can spend many minutes per executable upload, so a
    # killed run must still leave partial data
    order = [k for k in ("segm", "rpn", "detector") if k in shapes]
    for name in order:
        c, p, i, b, d, params = shapes[name]
        t_w0 = time.perf_counter()
        warm_train_program(c, p, i, b, d, params)
        setup_s = time.perf_counter() - t_w0
        key = jax.random.key(1)
        pos = jnp.asarray(
            rng.normal(size=(c, p, d)).astype(np.float32) + 1.0)
        posv = jnp.asarray(np.arange(p)[None, :] < min(p, 500)).repeat(
            c, axis=0)
        neg = jnp.asarray(
            rng.normal(size=(c, i, b, d)).astype(np.float32) - 1.0)
        negv = jnp.ones((c, i, b), bool)
        # stats= matches warm_train_program's with_stats=True signature so
        # the fit below executes the EXACT warmed AOT program (round-4
        # advisor: a stats=None fit has a different pytree signature, misses
        # the registry, and times a freshly traced no-stats program instead)
        stats = FeatureStats(jnp.zeros((d,)), jnp.ones((d,)),
                             jnp.asarray(20.0))

        def fit():
            m = train_classifiers_minibootstrap(
                key, pos, posv, neg, negv, params, stats=stats)
            jax.device_get(m.alpha)

        from online_detection_tpu.solvers import minibootstrap as MB

        hits0 = MB.AOT_HITS
        fit()  # throwaway: any residual load cost
        t0 = time.perf_counter()
        fit()
        print(json.dumps({
            "solver_precision": setting, "head": name,
            "warm_s": round(time.perf_counter() - t0, 4),
            "setup_s": round(setup_s, 2),
            "aot_hit": MB.AOT_HITS > hits0,
            "shape": [c, p, i, b, d],
        }), flush=True)


def main():
    for setting in ("default", "high", "highest"):
        env = dict(os.environ, ODTPU_SOLVER_PRECISION=setting)
        subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--one"], env=env)


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one()
    else:
        main()
