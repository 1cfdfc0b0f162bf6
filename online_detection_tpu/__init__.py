"""online_detection_tpu — TPU-native on-line object detection + segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hsp-iit/online-detection (on-line Mask R-CNN with FALKON kernel classifiers):

- ``models``   : ResNet-50-C4 Mask R-CNN feature extractor, on-line RPN,
                 on-line detection and per-pixel segmentation heads (pure JAX).
- ``ops``      : TPU kernels (Pallas + XLA fallbacks): Gaussian-kernel mmv,
                 RoIAlign, fixed-size NMS.
- ``solvers``  : FALKON (Nystrom kernel ridge regression via preconditioned
                 conjugate gradient) and RLS refiners, vmappable over classes.
- ``engine``   : feature-harvesting scan pipeline, inference loop, SGD trainers.
- ``data``     : iCWT / YCB-Video / HO-3D dataset readers + VOC evaluation.
- ``parallel`` : device-mesh / sharding helpers (data x class mesh axes).
- ``modules``  : API-parity facades mirroring the reference's public modules
                 (FeatureExtractor, OnlineRegionClassifier, FALKONWrapper,
                 RegionRefiner, AccuracyEvaluator).

Reference layout: see SURVEY.md at repo root. File:line citations in
docstrings refer to /root/reference (hsp-iit/online-detection).
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent on-disk compilation cache. TPU compiles of the big jitted
    programs (harvest trunk, minibootstrap) cost seconds-to-minutes —
    remotely-compiled executables included — and the cache removes them from
    every process after the first."""
    import os

    # CPU AOT cache artifacts are machine-feature-sensitive (SIGILL risk when
    # an entry compiled in a different sandbox is loaded), so only enable the
    # cache when the process is headed for the TPU backend.
    if "axon" not in os.environ.get("JAX_PLATFORMS", "") and "tpu" not in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "ODTPU_JAX_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_enable_compilation_cache()
