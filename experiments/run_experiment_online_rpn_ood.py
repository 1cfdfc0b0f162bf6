#!/usr/bin/env python
"""O-RPN + O-OD experiment: on-line RPN + on-line detection, NO segmentation
(the iCWT / TABLE-TOP detection benchmark). TPU-native counterpart of the
reference's ``experiments/run_experiment_online_rpn_ood.py`` (SURVEY.md §2.1):
serial two-pass pipeline — pass 1 extracts RPN features with GT-anchor
matching and trains the O-RPN; pass 2 re-extracts detector features with
proposals FROM the trained O-RPN, trains the detector, and evaluates."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from _common import dataset_canvas, load_configs, load_params, make_dataset  # noqa: E402

import jax  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="online_rpn_detection_experiment")
    parser.add_argument("--save_RPN_models", action="store_true")
    parser.add_argument("--load_RPN_models", action="store_true")
    parser.add_argument("--save_detector_models", action="store_true")
    parser.add_argument("--load_detector_models", action="store_true")
    parser.add_argument("--use_only_gt_positives_detection", action="store_true")
    parser.add_argument("--pos_fraction_feat_stats", type=float, default=0.8)
    parser.add_argument("--normalize_features_regressor_detector", action="store_true")
    parser.add_argument("--no_rpn", action="store_true",
                        help="Ablation: keep the pretrained RPN (no O-RPN)")
    parser.add_argument("--config_file_feature_extraction", type=str,
                        default="config_rpn_icwt30.yaml")
    parser.add_argument("--config_file_rpn_detection", type=str,
                        default="config_online_rpn_online_detection_icwt30.yaml")
    parser.add_argument("--minibootstrap_iterations", type=int)
    parser.add_argument("--CPU", action="store_true")
    parser.add_argument("--data_root", type=str, default="Data/datasets")
    parser.add_argument("--weights", type=str, default=None)
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

    from online_detection_tpu.pipelines import online_pipeline as pipe
    from online_detection_tpu.utils import checkpoint as ckpt

    train_cfg, det_cfg, extras = load_configs(
        args.config_file_feature_extraction,
        args.config_file_rpn_detection,
        args.minibootstrap_iterations,
    )
    train_cfg = train_cfg._replace(
        with_segmentation=False,
        pos_fraction_feat_stats=args.pos_fraction_feat_stats,
        use_only_gt_positives_detection=args.use_only_gt_positives_detection,
        normalize_features_regressor_detector=args.normalize_features_regressor_detector,
    )
    det_cfg = det_cfg._replace(
        normalize_regressor_features=args.normalize_features_regressor_detector
    )

    output_dir = args.output_dir
    os.makedirs(output_dir, exist_ok=True)
    train_ds = make_dataset(extras["train_datasets"][0], args.data_root)
    test_ds = make_dataset(extras["test_datasets"][0], args.data_root)
    params = load_params(args.weights, extras, train_cfg.num_classes)
    canvas = dataset_canvas(train_ds, extras)
    t_total = time.time()

    # ---- pass 1: O-RPN training (skipped with --no_rpn) ----
    online_rpn = None
    if not args.no_rpn:
        if args.load_RPN_models:
            online_rpn = ckpt.load_online_models(output_dir).rpn
        else:
            h1 = pipe.harvest_dataset(
                jax.random.key(1), params, train_ds, train_cfg, canvas,
                dcfg=det_cfg, output_dir=output_dir,
                min_size=extras["min_size_test"], max_size=extras["max_size_test"],
            )
            online_rpn = pipe.train_rpn_module(
                jax.random.key(2), h1["rpn"], train_cfg, output_dir
            )

    # ---- pass 2: detector features with the (trained) O-RPN proposals ----
    cfg2 = train_cfg._replace(with_rpn=False)
    h2 = pipe.harvest_dataset(
        jax.random.key(3), params, train_ds, cfg2, canvas,
        online_rpn=online_rpn, dcfg=det_cfg, output_dir=output_dir,
        min_size=extras["min_size_test"], max_size=extras["max_size_test"],
    )
    online = pipe.train_online_modules(jax.random.key(4), h2, cfg2, output_dir)
    online = online._replace(rpn=online_rpn)
    if args.save_RPN_models or args.save_detector_models:
        ckpt.save_online_models(output_dir, online)

    train_time = time.time() - t_total
    with open(os.path.join(output_dir, "result.txt"), "a") as fid:
        fid.write("Total training time: {}min:{}s \n".format(
            int(train_time / 60), round(train_time % 60)))

    results, _ = pipe.run_inference(
        params, online, test_ds, canvas, det_cfg, with_masks=False,
        output_dir=output_dir,
        iou_thresholds=extras["iou_thresholds"],
        use_07_metric=extras["use_07_metric"],
        min_size=extras["min_size_test"], max_size=extras["max_size_test"],
    )
    for k, v in results.items():
        if "map" in k:
            print(f"{k}: {v:.4f}")
    return results


if __name__ == "__main__":
    main()
