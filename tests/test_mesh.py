"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest).

Verifies the class-sharded minibootstrap (SURVEY.md §2.2: "the class axis as
a sharded mesh axis") against the unsharded solver, plus batch placement and
the make_mesh device-count guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_detection_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    train_classifiers_minibootstrap_sharded,
)
from online_detection_tpu.solvers.falkon import falkon_predict_classes
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)


# Pool sizes exactly fill the center quotas (6 positives = m//2, 6 negatives
# = m - m//2, one negative batch): center selection then takes every point
# once — no with-replacement duplicates, no padding — so K_MM is
# well-conditioned and f32 results are comparable across program partitions.
PARAMS = MinibootstrapParams(m=12, sigma=3.0, lam=1e-2)


def _toy_problem(rng, c=8, p_cap=6, n_iter=1, batch=6, d=8):
    pos = jnp.asarray(rng.normal(size=(c, p_cap, d)).astype(np.float32) + 1.0)
    neg = jnp.asarray(rng.normal(size=(c, n_iter, batch, d)).astype(np.float32) - 1.0)
    return pos, jnp.ones((c, p_cap), bool), neg, jnp.ones((c, n_iter, batch), bool)


def _scores(model, rng, d=8, n=32):
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    return np.asarray(falkon_predict_classes(model, x))


def test_mesh_requires_enough_devices():
    assert make_mesh(8).devices.size == 8  # conftest forces 8 CPU devices
    with pytest.raises(ValueError, match="devices requested"):
        make_mesh(len(jax.devices()) + 1)


def test_sharded_minibootstrap_matches_unsharded(rng):
    pos, pv, neg, nv = _toy_problem(rng, c=8)
    key = jax.random.key(0)
    ref = train_classifiers_minibootstrap(key, pos, pv, neg, nv, PARAMS)
    mesh = make_mesh(8)
    got = train_classifiers_minibootstrap_sharded(
        key, pos, pv, neg, nv, PARAMS, mesh
    )
    assert got.alpha.shape == ref.alpha.shape == (8, PARAMS.m)
    # sharding must not change what the models PREDICT (alphas live in an
    # ill-conditioned dual space; scores are the contract)
    np.testing.assert_allclose(
        _scores(got, np.random.default_rng(7)),
        _scores(ref, np.random.default_rng(7)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(got.exists), np.asarray(ref.exists))
    # result is actually laid out over the mesh: one class per device
    shard_devs = {s.device.id for s in got.alpha.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_minibootstrap_pads_class_axis(rng):
    # 5 classes on an 8-device mesh: padding classes must not leak back
    pos, pv, neg, nv = _toy_problem(rng, c=5)
    key = jax.random.key(1)
    ref = train_classifiers_minibootstrap(key, pos, pv, neg, nv, PARAMS)
    got = train_classifiers_minibootstrap_sharded(
        key, pos, pv, neg, nv, PARAMS, make_mesh(8)
    )
    assert got.alpha.shape == (5, PARAMS.m)
    np.testing.assert_allclose(
        _scores(got, np.random.default_rng(9)),
        _scores(ref, np.random.default_rng(9)),
        rtol=1e-4, atol=1e-4,
    )
    assert bool(got.exists.all())


def test_shard_batch_places_batch_axis():
    mesh = make_mesh(8)
    tree = {
        "x": jnp.zeros((16, 4), jnp.float32),
        "y": jnp.zeros((16,), jnp.int32),
    }
    out = shard_batch(tree, mesh)
    for leaf in jax.tree.leaves(out):
        shards = leaf.addressable_shards
        assert len({s.device.id for s in shards}) == 8
        assert shards[0].data.shape[0] == 2  # 16 rows / 8 devices
