#!/usr/bin/env python
"""Mask R-CNN fine-tuning baseline: freeze the backbone (and optionally the
RPN), re-init + SGD-train the output layers. TPU-native counterpart of the
reference's ``experiments/run_experiment_fine_tuning.py`` (SURVEY.md §3.5),
with the same freeze groups and time-budget protocol."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from _common import dataset_canvas, load_configs, load_params, make_dataset  # noqa: E402

import jax  # noqa: E402


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="fine_tuning_experiment")
    parser.add_argument("--train_for_time", type=str, default=None)
    parser.add_argument("--fine_tune_RPN", action="store_true",
                        help="Also train the RPN logits (otherwise frozen)")
    parser.add_argument("--fine_tune_last_layers", action="store_true",
                        help="Freeze everything except the final predictors")
    parser.add_argument("--use_backbone_features", action="store_true",
                        help="(from-features mode: backbone never recomputed; "
                        "functionally identical here since the backbone is frozen)")
    parser.add_argument("--extract_backbone_features", action="store_true",
                        help="Force (re-)extraction of the cached backbone "
                        "feature maps before training (reference "
                        "run_experiment_fine_tuning.py:17,69: extraction runs "
                        "only when given together with "
                        "--use_backbone_features)")
    parser.add_argument("--config_file", type=str, default="config_fine_tuning_ycbv.yaml")
    parser.add_argument("--data_root", type=str, default="Data/datasets")
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--CPU", action="store_true")
    parser.add_argument("--max_iter", type=int, default=None)
    parser.add_argument("--base_lr", type=float, default=None,
                        help="Override SOLVER.BASE_LR")
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
    import numpy as np

    from online_detection_tpu.engine.trainer import (
        SGDConfig, do_train, parse_time_budget,
    )

    train_cfg, det_cfg, extras = load_configs(args.config_file, None)
    output_dir = args.output_dir
    os.makedirs(output_dir, exist_ok=True)
    train_ds = make_dataset(extras["train_datasets"][0], args.data_root)
    params = load_params(args.weights, extras, train_cfg.num_classes)
    n_cls = train_cfg.num_classes + 1
    rng = np.random.default_rng(0)
    params["box_predictor"] = {
        "cls_w": jnp.asarray(rng.normal(0, 0.01, (2048, n_cls)).astype(np.float32)),
        "cls_b": jnp.zeros((n_cls,)),
        "bbox_w": jnp.asarray(rng.normal(0, 0.001, (2048, 4 * n_cls)).astype(np.float32)),
        "bbox_b": jnp.zeros((4 * n_cls,)),
    }
    if extras["mask_on"] and params.get("mask_head"):
        params["mask_head"]["logits_w"] = jnp.asarray(
            rng.normal(0, 0.01, (256, n_cls)).astype(np.float32)
        )
        params["mask_head"]["logits_b"] = jnp.zeros((n_cls,))
    canvas = dataset_canvas(train_ds, extras)

    cfg = SGDConfig(
        **extras["sgd"],
        freeze_backbone=True,
        freeze_rpn_except_logits=not args.fine_tune_RPN,
        freeze_heads_except_predictor=args.fine_tune_last_layers,
    )
    if args.base_lr is not None:
        cfg = cfg._replace(base_lr=args.base_lr)
    if args.max_iter:
        cfg = cfg._replace(max_iter=args.max_iter)

    if args.use_backbone_features:
        # cache the frozen C4 maps once and train from them
        # (``--use_backbone_features`` / detectors_train_from_backbone_features)
        from online_detection_tpu.engine.backbone_cache import (
            FromFeatDataset, dump_backbone_features,
        )

        feat_dir = os.path.join(output_dir, "features")
        if args.extract_backbone_features or not os.path.isdir(feat_dir):
            dump_backbone_features(
                params, train_ds, output_dir, canvas,
                extras["min_size_test"], extras["max_size_test"],
            )
        train_ds = FromFeatDataset(train_ds, feat_dir)

    params, hist = do_train(
        params, train_ds, canvas, cfg, jax.random.key(0),
        with_mask=extras["mask_on"],
        time_budget=parse_time_budget(args.train_for_time),
        min_size=extras["min_size_test"], max_size=extras["max_size_test"],
        flip_prob=extras["flip_prob_train"],
    )
    import pickle

    np.save(os.path.join(output_dir, "loss_history.npy"), np.asarray(hist))
    with open(os.path.join(output_dir, "model_final.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print("final loss:", hist[-1] if hist else None)
    return params


if __name__ == "__main__":
    main()
