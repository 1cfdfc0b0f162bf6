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

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SECONDS = 120.0


def main():
    import jax
    import jax.numpy as jnp

    # a silent CPU fallback (e.g. the chip is claimed by another process at
    # startup) would report flagship numbers hundreds of times slower than
    # the hardware — re-exec to retry backend init until the chip is free
    if jax.default_backend() != "tpu":
        attempt = int(os.environ.get("ODTPU_BENCH_ATTEMPT", "0"))
        if attempt < 20:
            print(
                f"# bench: TPU unavailable (backend={jax.default_backend()}), "
                f"retrying ({attempt})", file=sys.stderr,
            )
            time.sleep(30)
            os.environ["ODTPU_BENCH_ATTEMPT"] = str(attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise SystemExit("bench: no TPU backend after retries")
    print(f"# bench backend: {jax.default_backend()}", file=sys.stderr)

    from online_detection_tpu.solvers.minibootstrap import (
        MinibootstrapParams,
        train_classifiers_minibootstrap,
    )
    from online_detection_tpu.solvers.rls import rls_fit_grouped

    rng = np.random.default_rng(0)

    def mk(c, p, i, b, d):
        pos = jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32) + 0.5)
        neg = jnp.asarray(rng.normal(size=(c, i, b, d)).astype(np.float32) - 0.5)
        return pos, jnp.ones((c, p), bool), neg, jnp.ones((c, i, b), bool)

    det = mk(21, 500, 10, 2000, 2048)
    rpn = mk(15, 500, 10, 2000, 1024)
    seg = mk(21, 2000, 2, 20000, 256)
    det_p = MinibootstrapParams(m=1000, sigma=15.0, lam=1e-5)
    rpn_p = MinibootstrapParams(m=1000, sigma=50.0, lam=1e-3)
    seg_p = MinibootstrapParams(m=500, sigma=10.0, lam=1e-6)

    # shared COXY buffers, grouped on device (21k detector rows, 15k RPN rows)
    coxy_x = jnp.asarray(rng.normal(size=(21 * 1000, 2048)).astype(np.float32))
    coxy_y = jnp.asarray(rng.normal(size=(21 * 1000, 4)).astype(np.float32))
    coxy_c = jnp.asarray(np.repeat(np.arange(1, 22), 1000).astype(np.float32))
    coxy_w = jnp.ones((21 * 1000,))
    rpn_x = jnp.asarray(rng.normal(size=(15 * 1000, 1024)).astype(np.float32))
    rpn_y = jnp.asarray(rng.normal(size=(15 * 1000, 4)).astype(np.float32))
    rpn_c = jnp.asarray(np.repeat(np.arange(1, 16), 1000).astype(np.float32))
    rpn_w = jnp.ones((15 * 1000,))

    def full_training_step(key):
        m_det = train_classifiers_minibootstrap(key, *det, det_p)
        m_rpn = train_classifiers_minibootstrap(key, *rpn, rpn_p)
        m_seg = train_classifiers_minibootstrap(key, *seg, seg_p)
        r_det = rls_fit_grouped(coxy_x, coxy_y, coxy_c, coxy_w, 21, 1000.0,
                                device_solve=True)
        r_rpn = rls_fit_grouped(rpn_x, rpn_y, rpn_c, rpn_w, 15, 0.01,
                                device_solve=True)
        jax.block_until_ready(
            (m_det.alpha, m_rpn.alpha, m_seg.alpha, r_det.beta, r_rpn.beta)
        )
        return m_det, r_det, r_rpn

    # warm-up / compile (not timed)
    full_training_step(jax.random.key(0))

    t0 = time.perf_counter()
    full_training_step(jax.random.key(1))
    dt = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "online_training_time_flagship_scale",
                "value": round(dt, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
