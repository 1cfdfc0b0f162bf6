"""Device-mesh sharding for multi-chip scaling.

The reference's distributed story is a vestigial NCCL DDP scaffold
(SURVEY.md §2.2); the TPU-native design replaces it with a
``jax.sharding.Mesh`` and two natural data axes:

- **class axis**: the per-class FALKON minibootstrap and per-anchor RPN
  training are embarrassingly parallel across classes — sharding the leading
  class axis of the solver buffers runs 21 detector / 15 RPN / C
  segmentation heads across chips with zero collectives (ICI idle).
- **data axis**: feature harvesting and inference are data-parallel over
  images; a batched harvest shards the image axis, and the host accumulator
  consumes per-device chunks. XLA inserts any needed all-gathers.

Single-chip degrades gracefully (mesh of 1). Tested on the 8-virtual-device
CPU platform (tests/conftest.py) and exercised by ``__graft_entry__.
dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from online_detection_tpu.solvers.falkon import FalkonModel
from online_detection_tpu.solvers.minibootstrap import (
    MinibootstrapParams,
    train_classifiers_minibootstrap,
)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "mb") -> Mesh:
    """1-D mesh over ``n_devices`` (all devices when None).

    Raises when fewer devices exist than requested — a silent truncation
    would make an "8-device" dryrun quietly test a 1-device mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devices)} available on platform "
                f"{jax.default_backend()!r}; for CPU-simulated meshes set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                f"and JAX_PLATFORMS=cpu before any JAX computation"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def pad_axis(x: jax.Array, multiple: int, axis: int = 0) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def train_classifiers_minibootstrap_sharded(
    key: jax.Array,
    pos: jax.Array,  # [C, P, d]
    pos_valid: jax.Array,
    neg: jax.Array,  # [C, I, B, d]
    neg_valid: jax.Array,
    params: MinibootstrapParams,
    mesh: Mesh,
    axis_name: str = "mb",
    stats=None,
    class_chunk=None,
) -> FalkonModel:
    """Class-sharded minibootstrap: each device trains its slice of the
    classifiers concurrently. Thin alias over the PRODUCTION solver's mesh
    path (``train_classifiers_minibootstrap(mesh=...)``): the sharded
    program is the same statically-unrolled per-class prefix program as
    single-device, with optional stats-inside-the-program z-scoring and
    per-device class chunking. The class axis is padded to the mesh size;
    padded classes have no data and come back with exists=False."""
    return train_classifiers_minibootstrap(
        key, pos, pos_valid, neg, neg_valid, params,
        stats=stats, class_chunk=class_chunk, mesh=mesh, axis_name=axis_name,
    )


def shard_batch(tree, mesh: Mesh, axis_name: str = "mb"):
    """Place a pytree of [B, ...] arrays with the batch axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
