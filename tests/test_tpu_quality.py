"""TPU-vs-CPU smoke-quality parity (round-3 verdict item 2).

The flagship smoke experiment (tests/test_experiment_cli.py settings) must
reach comparable mAP on the real TPU backend as on CPU — the reference has
ONE hardware path and produces its quality numbers on it (f32 CUDA,
``mrcnn_modified/config/defaults.py:466``); this framework's target hardware
must not be its degraded path.

The suite's conftest pins the test process to the 8-virtual-device CPU
platform, so the TPU leg runs in a SUBPROCESS (no platform pin) through
``experiments/quality_ablation.py --run``, which executes the identical
experiment. Gated behind ``ODTPU_TPU_TESTS=1``: it needs the real chip and
~10 min of compiles over the dev tunnel.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.tpu


@pytest.mark.skipif(
    os.environ.get("ODTPU_TPU_TESTS") != "1",
    reason="needs the real TPU backend (set ODTPU_TPU_TESTS=1)",
)
def test_smoke_map_tpu_matches_cpu():
    """Default TPU numerics must land the smoke mAP within tolerance of the
    CPU reference (0.886/0.886 measured, tests/test_experiment_cli.py)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "experiments", "quality_ablation.py"),
         "--run", "tpu-device-default"],
        capture_output=True, text=True, timeout=1800,
        env={k: v for k, v in os.environ.items()
             # strip the CPU-tier pins AND conftest's scan-realization
             # default: the hardware gate must run the production
             # (unrolled) solver programs (round-5 review finding)
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                          "ODTPU_SOLVER_UNROLL")},
    )
    rec = None
    for line in proc.stdout.splitlines():
        if line.startswith("QABLATE "):
            rec = json.loads(line[len("QABLATE "):])
    assert rec is not None, (proc.returncode, proc.stderr[-2000:])
    assert rec["backend"] == "tpu", rec
    # tolerance 0.15: at smoke scale (3 test images, 2 classes) one flipped
    # detection moves mAP by ~0.11 under the VOC07 metric, so exact CPU
    # equality is not a meaningful target; a return of the round-3 gap
    # (det 0.50 vs 0.886) fails clearly
    assert abs(rec["det_map_0.5"] - 0.886) <= 0.15, rec
    assert abs(rec["segm_map_0.5"] - 0.886) <= 0.15, rec
