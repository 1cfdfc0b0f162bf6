"""Backbone-feature cache + train-from-features path."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.engine.backbone_cache import (
    FromFeatDataset,
    dump_backbone_features,
)
from online_detection_tpu.engine.trainer import SGDConfig, do_train
from online_detection_tpu.models.detector import init_detector_params
from tests.fixtures import make_synthetic_icwt


def test_dump_and_train_from_features(tmp_path, rng):
    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=3, n_test=1)
    ds = ICubWorldDataset(root, "Main", "train")
    params = init_detector_params(jax.random.key(0), 15, 20)
    params["box_predictor"] = {
        "cls_w": jnp.asarray(rng.normal(0, 0.01, (2048, 20)).astype(np.float32)),
        "cls_b": jnp.zeros((20,)),
        "bbox_w": jnp.asarray(rng.normal(0, 0.001, (2048, 80)).astype(np.float32)),
        "bbox_b": jnp.zeros((80,)),
    }
    out = str(tmp_path / "cache")
    feat_dir = dump_backbone_features(params, ds, out, (128, 192), 128, 320)
    assert len(os.listdir(feat_dir)) == 4  # 3 feature files + meta

    ff = FromFeatDataset(ds, feat_dir)
    c4, scale, (sw, sh) = ff.load_features(0)
    assert c4.shape == (128 // 16, 192 // 16, 1024)

    cfg = SGDConfig(
        base_lr=1e-3, max_iter=3, warmup_iters=0, post_nms_train=20,
        roi_batch=16, freeze_backbone=True,
    )
    params2, hist = do_train(
        params, ff, (128, 192), cfg, jax.random.key(1),
        with_mask=False, min_size=128, max_size=320, log_every=100,
    )
    assert len(hist) == 3 and all(np.isfinite(hist))
