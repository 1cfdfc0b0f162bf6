#!/usr/bin/env python
"""Overlay predicted boxes/masks from trained on-line models on images.

TPU-native counterpart of the reference's
``experiments/visualize_masks_online_segmentation.py`` (SURVEY.md §2.1
"Visualizer"): loads the on-line models saved by a previous experiment run,
runs OnlineSegmentationDemo on every test image, and writes overlay PNGs."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _common import dataset_canvas, load_configs, load_params, make_dataset  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models_dir", type=str, required=True,
                        help="Directory with classifier_*/regressor_*/stats_* files")
    parser.add_argument("--output_dir", type=str, default="visualizations")
    parser.add_argument("--config_file_feature_extraction", type=str,
                        default="config_feature_extraction_online_rpn_det_segm_ycbv.yaml")
    parser.add_argument("--data_root", type=str, default="Data/datasets")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--num_images", type=int, default=20)
    parser.add_argument("--confidence_threshold", type=float, default=0.0)
    parser.add_argument("--CPU", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.CPU:
        jax.config.update("jax_platforms", "cpu")
    elif jax.default_backend() == "tpu":
        # purge stale persistent-compile-cache entries from a different
        # libtpu build (would FAILED_PRECONDITION at dispatch otherwise)
        from online_detection_tpu.utils.compile_cache import guard_fingerprint

        guard_fingerprint()

    from PIL import Image

    from online_detection_tpu.modules.demo import OnlineSegmentationDemo
    from online_detection_tpu.utils.checkpoint import load_online_models

    train_cfg, det_cfg, extras = load_configs(
        args.config_file_feature_extraction, None
    )
    test_ds = make_dataset(extras["test_datasets"][0], args.data_root)
    params = load_params(args.weights, extras, train_cfg.num_classes)
    online = load_online_models(args.models_dir)
    canvas = dataset_canvas(test_ds, extras)

    demo = OnlineSegmentationDemo(
        params, online, test_ds.classes, canvas, det_cfg,
        min_size=extras["min_size_test"], max_size=extras["max_size_test"],
        confidence_threshold=args.confidence_threshold,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.num_images, len(test_ds))):
        rgb = test_ds.load_image(i)
        overlay = demo.overlay(rgb)
        out_path = os.path.join(args.output_dir, f"overlay_{i:04d}.png")
        Image.fromarray(overlay).save(out_path)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
