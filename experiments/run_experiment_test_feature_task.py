#!/usr/bin/env python
"""Checkpoint evaluation harness: run saved Mask R-CNN checkpoints through
the stock inference path and report VOC mAP. TPU-native counterpart of the
reference's ``experiments/run_experiment_test_feature_task.py`` (SURVEY.md
§4.2), which loops saved models through ``TesterFeatureTask``."""

import argparse
import glob
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from _common import dataset_canvas, load_configs, make_dataset  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="test_feature_task")
    parser.add_argument("--models_dir", type=str, required=False, default=None,
                        help="Directory of checkpoints (model_*.pkl/.pth) to test")
    parser.add_argument("--config_file", type=str, default="config_full_train_ycbv.yaml")
    parser.add_argument("--data_root", type=str, default="Data/datasets")
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

    import jax.numpy as jnp

    from online_detection_tpu.data import transforms
    from online_detection_tpu.data.evaluation import voc_eval
    from online_detection_tpu.models.anchors import grid_anchors
    from online_detection_tpu.models.detector import DetectorConfig, detect_pretrained
    from online_detection_tpu.models.weights import load_checkpoint

    train_cfg, det_cfg, extras = load_configs(args.config_file, None)
    test_ds = make_dataset(extras["test_datasets"][0], args.data_root)
    canvas = dataset_canvas(test_ds, extras)
    ch, cw = canvas
    anchors = jnp.asarray(grid_anchors(ch // 16, cw // 16))
    os.makedirs(args.output_dir, exist_ok=True)

    ckpts = []
    if args.models_dir:
        ckpts = sorted(
            glob.glob(os.path.join(args.models_dir, "model_*.pkl"))
            + glob.glob(os.path.join(args.models_dir, "model_*.pth"))
        )
    if not ckpts:
        print("No checkpoints found in", args.models_dir)
        return {}

    jit_detect = jax.jit(
        lambda p, a, im, sz: detect_pretrained(
            p, a, im, sz, det_cfg, with_masks=extras["mask_on"]
        )
    )

    all_results = {}
    for path in ckpts:
        if path.endswith(".pkl"):
            with open(path, "rb") as f:
                params = pickle.load(f)
            if "blobs" in params or "conv1_w" in params:
                params = load_checkpoint(path)
        else:
            params = load_checkpoint(path)
        predictions, ground_truths = [], []
        t0 = time.time()
        for i in range(len(test_ds)):
            anno = test_ds.get_annotation(i)
            rgb = test_ds.load_image(i)
            cimg, scale, (sw, sh) = transforms.preprocess_image(
                rgb, canvas, extras["min_size_test"], extras["max_size_test"]
            )
            dets, mask_probs, _, _ = jit_detect(
                params, anchors, jnp.asarray(cimg), jnp.asarray([sw, sh])
            )
            dets = jax.device_get(dets)
            v = dets.valid
            pred = {
                "boxes": dets.boxes[v] / scale,
                "scores": dets.scores[v],
                "labels": dets.labels[v],
            }
            if mask_probs is not None:
                pred["masks"] = np.asarray(jax.device_get(mask_probs))[v]
            predictions.append(pred)
            gt = {
                "boxes": anno.boxes, "labels": anno.labels,
                "difficult": anno.difficult,
            }
            if extras["mask_on"]:
                gt["masks"] = test_ds.load_masks(i, anno)
            ground_truths.append(gt)
        results = voc_eval.evaluate(
            predictions, ground_truths, test_ds.classes,
            iou_thresholds=extras["iou_thresholds"],
            use_07_metric=extras["use_07_metric"],
            evaluate_segmentation=extras["mask_on"],
            output_dir=args.output_dir,
        )
        print(os.path.basename(path), {k: round(v, 4) for k, v in results.items()
                                       if isinstance(v, float)},
              f"({time.time()-t0:.1f}s)")
        all_results[path] = results
    return all_results


if __name__ == "__main__":
    main()
