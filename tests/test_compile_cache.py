"""Compile-cache fingerprint guard (round-1 failure class: stale AOT entries
from a different libtpu build crashed the driver artifacts)."""

import os

from online_detection_tpu.utils import compile_cache


def test_fingerprint_guard_purges_on_change(tmp_path):
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    stale = os.path.join(cache, "jit_foo-abc-cache")
    open(stale, "w").write("x")
    # seed a mismatching fingerprint
    open(os.path.join(cache, ".libtpu_fingerprint"), "w").write("OLD BUILD")
    purged = compile_cache.guard_fingerprint(cache)
    assert purged is True
    assert not os.path.exists(stale)
    # second call: fingerprint now matches -> no purge
    open(os.path.join(cache, "jit_bar-def-cache"), "w").write("y")
    assert compile_cache.guard_fingerprint(cache) is False
    assert os.path.exists(os.path.join(cache, "jit_bar-def-cache"))


def test_stale_cache_error_detection():
    assert compile_cache.is_stale_cache_error(
        RuntimeError("FAILED_PRECONDITION: libtpu version mismatch: ...")
    )
    assert not compile_cache.is_stale_cache_error(ValueError("shape mismatch"))
