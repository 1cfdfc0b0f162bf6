#!/usr/bin/env python
"""Flagship experiment: on-line RPN + on-line detection + on-line segmentation.

TPU-native counterpart of the reference's
``experiments/run_experiment_online_rpn_ood_oos.py`` (call stack SURVEY.md
§3.1): single feature-extraction pass -> train O-RPN FALKON+RLS -> detector
FALKON+RLS -> per-pixel segmentation FALKON -> full evaluation, with the same
CLI flags and the same save/load file contracts.

Config files are the reference's YAML formats (feature-extraction yacs YAML +
on-line raw YAML); pass absolute paths or names resolved against
``experiments/configs``. Without config files, the shipped YCB-Video defaults
(SURVEY.md §2.4) apply.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str,
                        default="online_rpn_detection_segmentation_experiment_ycbv")
    parser.add_argument("--save_RPN_detector_segmentation_models", action="store_true")
    parser.add_argument("--load_RPN_detector_segmentation_models", action="store_true")
    parser.add_argument("--save_RPN_detector_segmentation_features", action="store_true")
    parser.add_argument("--load_RPN_detector_segmentation_features", action="store_true")
    parser.add_argument("--use_only_gt_positives_detection", action="store_true")
    parser.add_argument("--sampling_ratio_segmentation", type=float, default=0.3)
    parser.add_argument("--pos_fraction_feat_stats", type=float, default=0.8)
    parser.add_argument("--normalize_features_regressor_detector", action="store_true")
    parser.add_argument("--sampling_ratio_positives_detection", type=float, default=1.0)
    parser.add_argument("--config_file_feature_extraction", type=str,
                        default="config_feature_extraction_online_rpn_det_segm_ycbv.yaml")
    parser.add_argument("--config_file_online_rpn_detection_segmentation", type=str,
                        default="config_online_rpn_detection_segmentation_ycbv.yaml")
    parser.add_argument("--minibootstrap_iterations", type=int)
    parser.add_argument("--images_per_batch", type=int, default=8,
                        help="Stacked-canvas batch for harvest/inference "
                        "(the reference is hard-wired to 1; batching is the "
                        "TPU-native throughput lever)")
    parser.add_argument("--CPU", action="store_true",
                        help="Run solvers on the CPU platform instead of TPU")
    parser.add_argument("--n_devices", type=int, default=None,
                        help="Train multi-chip: build a 1-D jax.sharding.Mesh "
                        "over this many devices; the harvest batch axis is "
                        "data-sharded and every FALKON minibootstrap trains "
                        "class-sharded (SURVEY.md §2.2). Replaces the "
                        "reference's vestigial NCCL DDP scaffold "
                        "(extract_features_rpn_detector.py:41-42,81-86)")
    parser.add_argument("--data_root", type=str, default="Data/datasets",
                        help="Root of the dataset tree (reference layout)")
    parser.add_argument("--weights", type=str, default=None,
                        help="Path to a .pkl/.pth checkpoint for the feature extractor")
    parser.add_argument("--eval_segm_with_gt_bboxes", action="store_true")
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

    from _common import resolve_config
    from online_detection_tpu.config.config import (
        build_configs, load_yaml, resolve_dataset,
    )
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.data.transforms import canvas_size
    from online_detection_tpu.pipelines import online_pipeline as pipe
    from online_detection_tpu.utils import checkpoint as ckpt

    feat_cfg = {}
    online_cfg = {}
    p = resolve_config(args.config_file_feature_extraction)
    if p:
        feat_cfg = load_yaml(p)
    p = resolve_config(args.config_file_online_rpn_detection_segmentation)
    if p:
        online_cfg = load_yaml(p)

    train_cfg, det_cfg, extras = build_configs(
        feat_cfg, online_cfg, args.minibootstrap_iterations
    )
    train_cfg = train_cfg._replace(
        pos_fraction_feat_stats=args.pos_fraction_feat_stats,
        use_only_gt_positives_detection=args.use_only_gt_positives_detection,
        normalize_features_regressor_detector=args.normalize_features_regressor_detector,
        sampling_ratio_positives_detection=args.sampling_ratio_positives_detection,
    )
    det_cfg = det_cfg._replace(
        normalize_regressor_features=args.normalize_features_regressor_detector
    )

    output_dir = args.output_dir
    os.makedirs(output_dir, exist_ok=True)

    def make_dataset(name):
        factory, kwargs = resolve_dataset(name, args.data_root)
        if factory == "YCBVideoDataset":
            from online_detection_tpu.data.datasets.ycb_video import YCBVideoDataset

            return YCBVideoDataset(**kwargs)
        return ICubWorldDataset(
            kwargs["data_dir"], kwargs["image_set"], kwargs["split"],
            is_target_task=kwargs.get("is_target_task", False),
            icwt_21_objs=kwargs.get("icwt_21_objs", False),
        )

    train_ds = make_dataset(extras["train_datasets"][0])
    test_ds = make_dataset(extras["test_datasets"][0])

    # feature extractor weights
    from _common import load_params

    params = load_params(args.weights, extras, train_cfg.num_classes)

    info = train_ds.get_annotation(0)
    canvas = canvas_size(info.width, info.height,
                         extras["min_size_test"], extras["max_size_test"])

    total_t0 = time.time()
    mesh = None
    if args.n_devices and args.n_devices > 1:
        from online_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices)
    use_device_pipeline = (
        (jax.default_backend() == "tpu" or mesh is not None)
        and not args.save_RPN_detector_segmentation_features
        and not args.load_RPN_detector_segmentation_features
    )
    extraction_end = None
    if args.load_RPN_detector_segmentation_models:
        online = ckpt.load_online_models(output_dir)
    elif use_device_pipeline:
        # zero-roundtrip path: reservoirs + solvers stay in HBM
        from online_detection_tpu.pipelines import device_pipeline as dpipe

        warm_threads = []
        if (jax.default_backend() == "tpu" and mesh is None
                and os.environ.get("ODTPU_WARM_SOLVERS", "1") != "0"):
            # compile + device-load the solver executables on background
            # threads while the CNN harvest pass runs (their lazy first-call
            # load otherwise lands on the training-time critical path)
            # gt_cap/batch_size must mirror the harvest_dataset_device call
            # below: they size the reservoirs' scratch margins, which enter
            # the solver-program signatures (round-3 advisor: a mismatch
            # makes every warm a silent miss)
            warm_threads = dpipe.warm_solver_programs(
                train_cfg, batch_size=args.images_per_batch
            )
        state, _ = dpipe.harvest_dataset_device(
            jax.random.key(1), params, train_ds, train_cfg, canvas,
            dcfg=det_cfg, output_dir=output_dir,
            min_size=extras["min_size_test"], max_size=extras["max_size_test"],
            batch_size=args.images_per_batch, mesh=mesh,
        )
        extraction_end = time.time()
        for t in warm_threads:
            t.join()
        # list form transfers ownership: reservoirs are freed stage-by-stage
        holder = [state]
        del state
        online = dpipe.train_online_modules_device(
            jax.random.key(2), holder, train_cfg, output_dir, mesh=mesh
        )
        solver_end = time.time()
        if args.save_RPN_detector_segmentation_models:
            ckpt.save_online_models(output_dir, online)
    else:
        if args.load_RPN_detector_segmentation_features:
            # reference loader semantics (load_features_classifier): re-batch
            # negatives under SHUFFLE_NEGATIVES with the (possibly overridden)
            # ITERATIONS/BATCH_SIZE; subsample segmentation pools at the ratio
            harvest = ckpt.load_features(
                output_dir,
                det_shuffle_negatives=train_cfg.shuffle_negatives,
                rpn_shuffle_negatives=train_cfg.rpn_shuffle_negatives,
                iterations=train_cfg.iterations,
                batch_size=train_cfg.batch_size,
                sampling_ratio_segmentation=args.sampling_ratio_segmentation,
            )
            extraction_end = time.time()  # solver time excludes the load
        else:
            harvest = pipe.harvest_dataset(
                jax.random.key(1), params, train_ds, train_cfg, canvas,
                dcfg=det_cfg, output_dir=output_dir,
                min_size=extras["min_size_test"], max_size=extras["max_size_test"],
            )
            extraction_end = time.time()
            if args.save_RPN_detector_segmentation_features:
                ckpt.save_features(output_dir, harvest)
        online = pipe.train_online_modules(
            jax.random.key(2), harvest, train_cfg, output_dir
        )
        solver_end = time.time()
        if args.save_RPN_detector_segmentation_models:
            ckpt.save_online_models(output_dir, online)

    train_time = time.time() - total_t0
    with open(os.path.join(output_dir, "result.txt"), "a") as fid:
        fid.write(
            "\nTotal training time: {}min:{}s \n".format(
                int(train_time / 60), round(train_time % 60)
            )
        )
        # reference also records the solver-only time
        # (``run_experiment_online_rpn_ood_oos.py:275-277``)
        if extraction_end is not None:
            tr_time = solver_end - extraction_end
            fid.write(
                "Training time for the online modules: {}min:{}s \n\n".format(
                    int(tr_time / 60), round(tr_time % 60)
                )
            )

    results, _ = pipe.run_inference(
        params, online, test_ds, canvas, det_cfg,
        output_dir=output_dir,
        iou_thresholds=extras["iou_thresholds"],
        use_07_metric=extras["use_07_metric"],
        min_size=extras["min_size_test"], max_size=extras["max_size_test"],
        eval_segm_with_gt_bboxes=args.eval_segm_with_gt_bboxes,
        batch_size=args.images_per_batch, mesh=mesh,
    )
    for k, v in results.items():
        if k.endswith("map_0.5") or k.endswith("map_0.7"):
            print(f"{k}: {v:.4f}")
    return results


if __name__ == "__main__":
    main()
