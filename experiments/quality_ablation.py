#!/usr/bin/env python
"""Per-stage numerics ablation of the TPU-vs-CPU smoke-quality gap.

Round-3 verdict item 2: the flagship smoke CLI (4 train / 3 test synthetic
images, tests/test_experiment_cli.py settings) measured det/segm mAP@0.5
0.886/0.886 on CPU but 0.50/0.27 on the real TPU. The reference produces its
quality numbers in f32 on one hardware path (``mrcnn_modified/config/
defaults.py:466``); this framework's TPU path differs from its CPU path in
three ways, each toggled here independently:

  1. pipeline PATH — TPU takes the zero-roundtrip device pipeline
     (``pipelines/device_pipeline.py``), --CPU takes the host pipeline;
  2. trunk DTYPE — ``resolve_compute_dtype`` auto-selects bfloat16 on TPU,
     float32 on CPU (override: ``ODTPU_COMPUTE_DTYPE``);
  3. matmul PRECISION — XLA's DEFAULT f32 matmul precision on TPU is one
     bf16 pass; on CPU f32 dots are exact
     (override: ``JAX_DEFAULT_MATMUL_PRECISION=highest``).

Each mode runs the identical smoke experiment in a fresh subprocess (env
decides backend/numerics before JAX imports). Results print as one table;
the driver-recorded counterpart is bench.py's ``smoke_map_tpu`` metric.

Usage: python experiments/quality_ablation.py [--modes a,b,...]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mode -> (extra argv, env overrides)
MODES = {
    # the two endpoints of the reported gap
    "cpu-host-f32": (["--CPU"], {}),
    "tpu-device-default": ([], {}),
    # isolate the pipeline PATH: device pipeline on the CPU backend
    # (2-virtual-device mesh forces the device path under --CPU; mesh
    # training is equality-asserted vs single-device in test_mesh.py)
    "cpu-device-f32": (
        ["--CPU", "--n_devices", "2"],
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"},
    ),
    # isolate trunk dtype on TPU
    "tpu-device-f32trunk": ([], {"ODTPU_COMPUTE_DTYPE": "float32"}),
    # isolate matmul precision on TPU (bf16 trunk kept; fused Pallas stem
    # disabled — the global precision flag used to leak fp32 contract
    # precision onto its bf16 Mosaic matmuls)
    "tpu-device-highest": (
        [],
        {"JAX_DEFAULT_MATMUL_PRECISION": "highest", "ODTPU_FUSED_STEM": "0"},
    ),
    # full quality-first configuration on TPU
    "tpu-device-f32trunk-highest": (
        [],
        {
            "ODTPU_COMPUTE_DTYPE": "float32",
            "JAX_DEFAULT_MATMUL_PRECISION": "highest",
        },
    ),
    # role split (round 4, second pass): which SIDE of the online-model math
    # actually needs the bf16x3 passes? "solver" = minibootstrap mining +
    # falkon_fit's K_NM/Z/Gram chain (the training-side bulk FLOPs; 1-pass
    # default here recovers the solver headline 2.38 s -> ~1.3 s);
    # "apply" = inference scores + RLS deltas (the quality-deciding outputs).
    "tpu-solver-default": ([], {"ODTPU_SOLVER_PRECISION": "default"}),
    "tpu-apply-default": ([], {"ODTPU_APPLY_PRECISION": "default"}),
}


def run_one(mode: str) -> dict:
    """Run the smoke experiment for one mode (this process, env already set
    by the parent). Prints one JSON line with the mAPs."""
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "experiments"))
    from tests.fixtures import make_synthetic_icwt
    from tests.test_experiment_cli import FEAT_CFG, ONLINE_CFG

    tmp = tempfile.mkdtemp(prefix=f"qablate_{mode}_")
    root = os.path.join(tmp, "ycbv_synth")
    make_synthetic_icwt(root, n_train=4, n_test=3)
    feat_path = os.path.join(tmp, "feat.yaml")
    with open(feat_path, "w") as f:
        f.write(FEAT_CFG.format(root=root))
    online_path = os.path.join(tmp, "online.yaml")
    with open(online_path, "w") as f:
        f.write(ONLINE_CFG)

    import run_experiment_online_rpn_ood_oos as exp

    argv_extra, _env = MODES[mode]
    results = exp.main(
        [
            "--output_dir", os.path.join(tmp, "out"),
            "--config_file_feature_extraction", feat_path,
            "--config_file_online_rpn_detection_segmentation", online_path,
        ]
        + argv_extra
    )
    import jax

    rec = {
        "mode": mode,
        "backend": jax.default_backend(),
        "det_map_0.5": round(float(results["det_map_0.5"]), 4),
        "segm_map_0.5": round(float(results["segm_map_0.5"]), 4),
    }
    print("QABLATE " + json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=str, default=",".join(MODES))
    ap.add_argument("--run", type=str, default=None, help="(internal)")
    args = ap.parse_args(argv)
    if args.run:
        run_one(args.run)
        return

    rows = []
    for mode in args.modes.split(","):
        _extra, env_over = MODES[mode]
        env = dict(os.environ, **env_over)
        print(f"== {mode} (env {env_over}) ==", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", mode],
            env=env, capture_output=True, text=True,
        )
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("QABLATE "):
                rec = json.loads(line[len("QABLATE "):])
        if rec is None:
            print(f"  FAILED rc={proc.returncode}:\n{proc.stderr[-2000:]}")
            rec = {"mode": mode, "error": proc.returncode}
        else:
            print(f"  det {rec['det_map_0.5']}  segm {rec['segm_map_0.5']}"
                  f"  ({rec['backend']})")
        rows.append(rec)

    print("\nmode".ljust(33), "det_map", "segm_map")
    for r in rows:
        if "error" in r:
            print(r["mode"].ljust(32), "ERROR", r["error"])
        else:
            print(r["mode"].ljust(32), r["det_map_0.5"], r["segm_map_0.5"])


if __name__ == "__main__":
    main()
