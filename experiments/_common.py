"""Shared plumbing for the experiment CLIs (config resolution, dataset and
weight construction). The per-experiment scripts mirror the reference's
entry points (SURVEY.md §7 step 7) and stay thin."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def resolve_config(path):
    """Resolve a config name against experiments/configs, else as a path.

    A named-but-missing config RAISES instead of silently falling back to
    built-in defaults — a run on the wrong hyperparameters is worse than no
    run. Pass an empty string/None to explicitly request the defaults.
    """
    if not path:
        return None
    if not os.path.isabs(path):
        local = os.path.join(os.path.dirname(__file__), "configs", path)
        if os.path.exists(local):
            return local
    if os.path.exists(path):
        return path
    raise FileNotFoundError(
        f"config file {path!r} not found (looked in experiments/configs and "
        f"as a path); pass '' to run on built-in defaults"
    )


def load_configs(feat_path, online_path, minibootstrap_iterations=None):
    from online_detection_tpu.config.config import build_configs, load_yaml

    feat_cfg = {}
    online_cfg = {}
    p = resolve_config(feat_path)
    if p:
        feat_cfg = load_yaml(p)
    p = resolve_config(online_path)
    if p:
        online_cfg = load_yaml(p)
    return build_configs(feat_cfg, online_cfg, minibootstrap_iterations)


def make_dataset(name, data_root="Data/datasets"):
    from online_detection_tpu.config.config import resolve_dataset
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset

    factory, kwargs = resolve_dataset(name, data_root)
    if factory == "YCBVideoDataset":
        from online_detection_tpu.data.datasets.ycb_video import YCBVideoDataset

        return YCBVideoDataset(
            data_dir=kwargs["data_dir"], image_set=kwargs["image_set"],
            split=kwargs["split"],
        )
    return ICubWorldDataset(
        kwargs["data_dir"], kwargs["image_set"], kwargs["split"],
        is_target_task=kwargs.get("is_target_task", False),
        icwt_21_objs=kwargs.get("icwt_21_objs", False),
    )


def resolve_weight(weight_ref):
    """MODEL.WEIGHT -> local file path, or None.

    The reference's configs use three forms (``paths_catalog.py:350-403``,
    ``DetectronCheckpointer``): ``catalog://...`` model-zoo URIs, bare
    filenames (resolved under Data/pretrained_feature_extractors/), and
    plain paths."""
    if not weight_ref:
        return None
    candidates = [
        weight_ref.replace("catalog://", "Data/pretrained_feature_extractors/"),
        os.path.join("Data/pretrained_feature_extractors", weight_ref),
        weight_ref,
    ]
    for c in candidates:
        if "catalog://" not in c and os.path.exists(c):
            return c
    return None


def load_params(weights_arg, extras, num_classes):
    from online_detection_tpu.models.detector import init_detector_params
    from online_detection_tpu.models.weights import load_checkpoint

    if weights_arg and os.path.exists(weights_arg):
        return load_checkpoint(weights_arg)
    local = resolve_weight(extras.get("weight") or "")
    if local:
        return load_checkpoint(local)
    print(
        "WARNING: no pretrained weights found — using random init "
        "(pass --weights for real runs)"
    )
    return init_detector_params(jax.random.key(0), 15, num_classes + 1)


def dataset_canvas(dataset, extras):
    from online_detection_tpu.data.transforms import canvas_size

    info = dataset.get_annotation(0)
    return canvas_size(
        info.width, info.height, extras["min_size_test"], extras["max_size_test"]
    )
