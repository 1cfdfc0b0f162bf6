"""Overflow accounting (VERDICT round 1, item 4): every fixed capacity that
drops rows must count the drops and report them (result.txt ``truncated:``
line) — the reference keeps unbounded per-class lists
(``box_head_getProposals.py:161-172``), so silent truncation would silently
change the trained models."""

import os

import jax
import numpy as np
import pytest

from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
from online_detection_tpu.engine.accumulate import (
    _batch_split,
    _pad_stack,
    _round_robin_split,
)
from online_detection_tpu.models.detector import DetectorConfig, init_detector_params
from online_detection_tpu.pipelines.online_pipeline import (
    OnlineTrainConfig,
    harvest_dataset,
)
from tests.fixtures import make_synthetic_icwt

CANVAS = (128, 192)
MIN_SIZE, MAX_SIZE = 128, 320


def test_pad_stack_counts_drops(rng):
    arrays = [rng.normal(size=(5, 3)).astype(np.float32),
              rng.normal(size=(2, 3)).astype(np.float32)]
    out, valid, dropped = _pad_stack(arrays, 3, 3)
    assert dropped == 2  # 5 - 3 from the first class
    assert valid.sum() == 5


def test_batch_split_counts_drops(rng):
    pool = rng.normal(size=(10, 3)).astype(np.float32)
    out, valid, dropped = _batch_split(pool, 2, 3, 3, rng)
    assert dropped == 4  # 10 - 2*3
    assert valid.sum() == 6


def test_round_robin_split_counts_drops(rng):
    chunks = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    out, valid, dropped = _round_robin_split(chunks, 2, 3, 3)
    assert dropped == 20 - int(valid.sum())
    assert dropped > 0


def test_device_pool_counts_attempted_drops():
    from online_detection_tpu.engine import device_accumulate as dacc
    import jax.numpy as jnp

    pool = dacc.Pool.make(1, 4, 3, 4)  # capacity 8, append width 4
    rows = jnp.ones((1, 4, 3))
    valid = jnp.ones((1, 4), bool)
    for _ in range(4):  # 16 rows into a capacity-8 pool (count clamps at 4)
        pool = dacc._append(pool, rows, valid)
    assert int(pool.counts[0]) == 4
    assert int(pool.attempted[0]) == 16
    assert pool.dropped() == 12


def test_harvest_reports_truncation_in_result_txt(tmp_path):
    """Overfilled pools -> nonzero truncation dict + result.txt line."""
    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=6, n_test=2)
    train_ds = ICubWorldDataset(root, "Main", "train")
    params = init_detector_params(jax.random.key(0), 15, 20)
    out_dir = str(tmp_path / "out")

    # absurdly small minibootstrap pools: 1 batch of 4 rows per class while
    # each of the 6 images contributes ceil(B*I/n_images)=1+ negatives
    cfg = OnlineTrainConfig(
        num_classes=19, iterations=1, batch_size=4, segm_batch_size=64,
        shuffle_negatives=True,
    )
    dcfg = DetectorConfig(pre_nms_top_n=200, post_nms_top_n=50,
                          detections_per_img=10)
    harvest = harvest_dataset(
        jax.random.key(1), params, train_ds, cfg, CANVAS,
        dcfg=dcfg, gt_cap=4, output_dir=out_dir,
        min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    trunc = harvest["truncation"]
    assert trunc["total"] > 0
    assert trunc["rpn_neg"] > 0  # 15 anchor pools of 4 rows vs 6+ rows each
    txt = open(os.path.join(out_dir, "result.txt")).read()
    assert "truncated:" in txt


def test_harvest_no_truncation_no_line(tmp_path):
    """Ample capacities -> zero drops and NO result.txt line."""
    root = str(tmp_path / "ycbv_synth")
    # n_images divides B*I exactly -> negatives_to_pick rounding can't
    # overfill the pools (with uneven counts the reference drops the
    # remainder too: its round-robin filling stops at full batches)
    make_synthetic_icwt(root, n_train=4, n_test=2)
    train_ds = ICubWorldDataset(root, "Main", "train")
    params = init_detector_params(jax.random.key(0), 15, 20)
    out_dir = str(tmp_path / "out")
    cfg = OnlineTrainConfig(
        num_classes=19, iterations=2, batch_size=64, segm_batch_size=512,
    )
    dcfg = DetectorConfig(pre_nms_top_n=200, post_nms_top_n=50,
                          detections_per_img=10)
    harvest = harvest_dataset(
        jax.random.key(1), params, train_ds, cfg, CANVAS,
        dcfg=dcfg, gt_cap=4, output_dir=out_dir,
        min_size=MIN_SIZE, max_size=MAX_SIZE,
    )
    assert harvest["truncation"]["total"] == 0
    txt = open(os.path.join(out_dir, "result.txt")).read()
    assert "truncated:" not in txt