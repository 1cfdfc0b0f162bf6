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
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, required=True,
                        help=".pkl (Caffe2 Detectron) or .pth checkpoint")
    parser.add_argument("--CPU", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    if args.CPU:
        jax.config.update("jax_platforms", "cpu")

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
