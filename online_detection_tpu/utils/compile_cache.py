"""Persistent-compile-cache hygiene for TPU processes.

The framework enables JAX's on-disk compilation cache for TPU-bound
processes (package ``__init__``) because the big jitted programs cost
seconds-to-minutes through the remote compiler. AOT entries are only valid
for the libtpu build that produced them — a mismatch raises
``FAILED_PRECONDITION: libtpu version mismatch`` at dispatch time (this
crashed the round-1 multichip driver artifact). This module stores the
platform fingerprint next to the cache and purges stale entries instead.
"""

from __future__ import annotations

import os
import shutil


def default_cache_dir() -> str:
    return os.path.abspath(
        os.environ.get(
            "ODTPU_JAX_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
        )
    )


def purge(cache_dir: str | None = None) -> None:
    shutil.rmtree(cache_dir or default_cache_dir(), ignore_errors=True)


def guard_fingerprint(cache_dir: str | None = None) -> bool:
    """Compare the current platform fingerprint with the cache's; purge the
    cache when the libtpu build changed. Returns True if the cache was
    purged. Initializes the JAX backend — call only once the process has
    committed to a platform."""
    cache_dir = cache_dir or default_cache_dir()
    try:
        import jax

        version = jax.devices()[0].client.platform_version
    except Exception:
        return False
    os.makedirs(cache_dir, exist_ok=True)
    fp_path = os.path.join(cache_dir, ".libtpu_fingerprint")
    old = None
    if os.path.exists(fp_path):
        with open(fp_path) as f:
            old = f.read()
    has_entries = any(
        name != ".libtpu_fingerprint" for name in os.listdir(cache_dir)
    )
    # a non-empty cache with NO fingerprint is a legacy/unknown-build cache
    # (round 1 wrote entries before this guard existed) — treat as stale
    purged = False
    if old != version and (old is not None or has_entries):
        purge(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        purged = True
    with open(fp_path, "w") as f:
        f.write(version)
    return purged


def is_stale_cache_error(err: BaseException) -> bool:
    msg = str(err)
    return "libtpu version mismatch" in msg or (
        "FAILED_PRECONDITION" in msg and "AOT" in msg
    )


def is_executable_lifecycle_error(err: BaseException) -> bool:
    """The round-3 failure class: a process that has loaded many large
    executables (the unrolled minibootstraps serialize to ~120 MB each) hits
    ``FAILED_PRECONDITION: TPU backend error`` on the next big program load
    — distinct from the stale-AOT-cache FAILED_PRECONDITION above."""
    return "FAILED_PRECONDITION" in str(err) and not is_stale_cache_error(err)


def run_with_executable_recovery(fn, *args, retries: int = 1, **kwargs):
    """Call ``fn``; on an executable-lifecycle FAILED_PRECONDITION, evict the
    process's executable population — the AOT solver registry
    (:func:`online_detection_tpu.solvers.minibootstrap.evict_aot_programs`)
    AND every jit-held executable (``jax.clear_caches()``) — then retry.

    ``fn`` must be re-runnable from scratch (it is re-invoked with the same
    arguments; any donated/consumed device buffers must be rebuilt inside
    it). Long-lived production processes that harvest, train, and serve
    sequentially walk the same executable population as the bench; this is
    the framework-level detection + eviction + retry for that class."""
    import gc
    import logging

    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered below
            if attempt >= retries or not is_executable_lifecycle_error(e):
                raise
            import jax

            from online_detection_tpu.solvers.minibootstrap import (
                evict_aot_programs,
            )

            n = evict_aot_programs()
            jax.clear_caches()
            gc.collect()
            logging.getLogger("online_detection_tpu").warning(
                "FAILED_PRECONDITION (executable lifecycle): evicted %d AOT "
                "programs + jit caches, retrying (%d/%d): %r",
                n, attempt + 1, retries, e,
            )
