"""Canvas loading for the pipeline hot loops.

TPU-native replacement for the reference's DataLoader layer
(``mrcnn_modified/data/build.py:82-203``: samplers + ``NUM_WORKERS=4``
prefetch): decode + min/max-side resize + canvas padding run in the native
threaded prefetcher (``native/odtpu_io.cc`` via ``utils/native_io.py``) so
host IO overlaps device compute; a synchronous PIL path covers datasets
without filesystem-backed images (or a missing native build). Output parity
between the two paths is pinned by ``tests/test_native_io.py``.
"""

from __future__ import annotations

from typing import Tuple

from online_detection_tpu.data import transforms
from online_detection_tpu.utils import native_io


class CanvasLoader:
    """``get(i) -> (uint8 canvas [ch,cw,3], scale, (sw, sh))`` over a dataset."""

    def __init__(self, dataset, canvas_hw: Tuple[int, int],
                 min_size: int = 600, max_size: int = 1333,
                 n_threads: int = 4, window: int = 16):
        self.dataset = dataset
        self.canvas_hw = canvas_hw
        self.min_size = min_size
        self.max_size = max_size
        self._prefetcher = None
        if hasattr(dataset, "image_path") and native_io.available():
            try:
                paths = [dataset.image_path(i) for i in range(len(dataset))]
                if all(p.lower().endswith((".jpg", ".jpeg", ".png")) for p in paths):
                    self._prefetcher = native_io.Prefetcher(
                        paths, canvas_hw, min_size, max_size,
                        n_threads=n_threads, window=window,
                    )
            except Exception:  # native path is an optimization only
                self._prefetcher = None

    @property
    def native(self) -> bool:
        return self._prefetcher is not None

    def get(self, index: int):
        if self._prefetcher is not None:
            try:
                return self._prefetcher.get(index)
            except IOError:
                pass  # fall back for this item (corrupt/unsupported file)
        rgb = self.dataset.load_image(index)
        return transforms.preprocess_image_u8(
            rgb, self.canvas_hw, self.min_size, self.max_size
        )

    def close(self):
        if self._prefetcher is not None:
            self._prefetcher.close()
            self._prefetcher = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
