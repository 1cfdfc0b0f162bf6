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
# CPU CI runs the solver's SCAN realization (same fixpoint as the production
# unrolled programs — test_minibootstrap.py::test_unrolled_matches_scan
# builds BOTH explicitly and asserts equality, and the round-5 TPU drive
# measured max |Δalpha| = 0.0): the statically-unrolled programs exist for
# warm-run speed on the TPU, while on the 1-core CPU tier their compiles
# alone cost many minutes across the CLI/pipeline tests. Production (TPU)
# keeps the unrolled default; export ODTPU_SOLVER_UNROLL=1 to force the
# unroll here too.
os.environ.setdefault("ODTPU_SOLVER_UNROLL", "0")

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

# Two-tier suite: ``pytest -m fast`` is the driver/CI-budget tier (~3.5 min
# on one core: solvers, ops, boxes, eval, configs, reference parity — the
# differential parity suites grew the tier); everything else (CLI smoke,
# pipelines, mesh, trainers) is marked slow automatically. Full suite ~40 min
# single-core (test_serial_cli alone is ~11 min: two full CNN passes).
_FAST_MODULES = {
    "test_anchors", "test_boxes", "test_coco_rle", "test_compile_cache", "test_configs",
    "test_data_eval", "test_falkon", "test_gaussian_mmv", "test_minibootstrap",
    "test_native_io", "test_nms", "test_reference_parity",
    "test_reference_parity_eval", "test_reference_parity_harvest",
    "test_reference_parity_tools", "test_rls",
    "test_rls_device_solve", "test_roi_align", "test_weights", "test_ycb_video",
}


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        mod = mod[:-3] if mod.endswith(".py") else mod
        item.add_marker(
            pytest.mark.fast if mod in _FAST_MODULES else pytest.mark.slow
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
