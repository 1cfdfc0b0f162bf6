"""Test configuration: force an 8-virtual-device CPU mesh before JAX import.

Multi-chip sharding logic is exercised on a simulated 8-device CPU platform
(`xla_force_host_platform_device_count=8`), per the repo build contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers a remote TPU backend and
# overrides JAX_PLATFORMS; backends are created lazily, so overriding the
# config here (before any computation) still pins tests to the 8-device
# virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
# the framework enables a persistent compilation cache for TPU programs;
# CPU AOT artifacts are machine-feature-sensitive across sandboxes, so keep
# the CPU test runs cache-free
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
