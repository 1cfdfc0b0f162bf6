#!/usr/bin/env python
"""Converter smoke validation against REAL checkpoints.

Usage:
    python experiments/weights_smoke.py --weights Data/pretrained_feature_extractors/e2e_mask_rcnn_R_50_C4_1x.pkl

Loads the checkpoint through the converter (``models/weights.py`` — flagged
by SURVEY.md as the highest silent-wrongness risk), runs every stage of the
forward pass on a fixed synthetic image, and prints one JSON line per stage
with shape/mean/std/absmax. Compare against a known-good run (or the torch
reference fed the same input) to localize a layout/folding bug to a stage.
Reference load path: ``DetectronCheckpointer``
(``extract_features_rpn_detector.py:131-140``).

``--selftest`` (no checkpoint needed — runnable in the sandbox, so the
PROCEDURE itself is tested before any real asset exists): random-init
params are exported to BOTH checkpoint formats (Caffe2 .pkl and torch
.pth via ``export_caffe2_blobs`` / ``export_torch_state_dict``), reloaded
through both converters, and all three parameter trees must produce
identical activation checksums. A layout or BN-folding bug in either
converter direction breaks the equality.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def selftest(seed: int = 0):
    """Round-trip both converter directions on random weights; see module
    docstring. Returns the checksum dict on success, raises on mismatch."""
    import pickle
    import tempfile

    import jax
    import numpy as np

    from online_detection_tpu.models.detector import init_detector_params
    from online_detection_tpu.models.weights import (
        activation_checksums,
        export_caffe2_blobs,
        export_torch_state_dict,
        load_checkpoint,
    )

    params = init_detector_params(jax.random.key(seed), 15, 22)
    k = jax.random.split(jax.random.key(seed + 1), 2)
    params["box_predictor"] = {
        "cls_w": jax.random.normal(k[0], (2048, 22)) * 0.01,
        "cls_b": jax.numpy.zeros((22,)),
        "bbox_w": jax.random.normal(k[1], (2048, 88)) * 0.01,
        "bbox_b": jax.numpy.zeros((88,)),
    }

    tmp = tempfile.mkdtemp(prefix="odtpu_weights_selftest_")
    pkl_path = os.path.join(tmp, "ckpt.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump({"blobs": export_caffe2_blobs(params)}, f)
    pth_path = os.path.join(tmp, "ckpt.pth")
    import torch

    torch.save({"model": export_torch_state_dict(params)}, pth_path)

    ref = activation_checksums(params, seed=seed)
    for name, path in (("caffe2_pkl", pkl_path), ("torch_pth", pth_path)):
        got = activation_checksums(load_checkpoint(path), seed=seed)
        assert set(got) == set(ref), (name, set(got) ^ set(ref))
        for stage in ref:
            for field in ("mean", "std", "absmax"):
                a, b = ref[stage][field], got[stage][field]
                assert np.isclose(a, b, rtol=1e-5, atol=1e-7), (
                    f"{name}/{stage}/{field}: original {a} != reloaded {b} "
                    f"— converter layout/folding bug"
                )
            assert tuple(ref[stage]["shape"]) == tuple(got[stage]["shape"])
        print(json.dumps({"selftest": name, "stages": len(got), "ok": True}))
    print(json.dumps({"selftest": "PASS",
                      "stages": sorted(ref)}))
    return ref


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, default=None,
                        help=".pkl (Caffe2 Detectron) or .pth checkpoint")
    parser.add_argument("--selftest", action="store_true",
                        help="no-asset converter round-trip (see docstring)")
    parser.add_argument("--CPU", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    if args.CPU:
        jax.config.update("jax_platforms", "cpu")

    if args.selftest:
        return selftest(seed=args.seed)
    if not args.weights:
        raise SystemExit("one of --weights or --selftest is required")

    from online_detection_tpu.models.weights import (
        activation_checksums,
        load_checkpoint,
    )

    params = load_checkpoint(args.weights)
    sums = activation_checksums(params, seed=args.seed)
    for stage, rec in sums.items():
        print(json.dumps({"stage": stage, **rec}))
    return sums


if __name__ == "__main__":
    main()
