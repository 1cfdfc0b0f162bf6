"""ctypes bindings for the native IO runtime (native/odtpu_io.cc).

Host-side hot path: JPEG/PNG decode, min/max-side resize, canvas packing,
VOC XML parsing, and a threaded prefetcher that keeps decoded canvases ahead
of the device loop. Falls back to the pure-Python implementations when the
shared library is absent (``make -C native`` builds it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "libodtpu_io.so"
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        try:  # best-effort build (toolchain is in the image)
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.odtpu_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.odtpu_prepare_canvas.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.odtpu_parse_voc_xml.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
    ]
    lib.odtpu_prefetcher_create.restype = ctypes.c_void_p
    lib.odtpu_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.odtpu_prefetcher_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.odtpu_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.odtpu_decode_image(path.encode(), ctypes.byref(data),
                                ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    arr = np.ctypeslib.as_array(data, shape=(h.value, w.value, 3)).copy()
    lib.odtpu_free(data)
    return arr


def prepare_canvas(
    path: str, canvas_hw: Tuple[int, int], min_size: int = 600,
    max_size: int = 1333,
) -> Optional[Tuple[np.ndarray, float, Tuple[int, int]]]:
    lib = _load()
    if lib is None:
        return None
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.uint8)
    scale = ctypes.c_float()
    sw = ctypes.c_int()
    sh = ctypes.c_int()
    rc = lib.odtpu_prepare_canvas(
        path.encode(), canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ch, cw, min_size, max_size,
        ctypes.byref(scale), ctypes.byref(sw), ctypes.byref(sh),
    )
    if rc != 0:
        return None
    return canvas, scale.value, (sw.value, sh.value)


def parse_voc_xml(path: str):
    """-> (width, height, boxes [N,4], names list, difficult [N]) or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    boxes = ctypes.POINTER(ctypes.c_float)()
    diff = ctypes.POINTER(ctypes.c_int)()
    names = ctypes.c_char_p()
    n = ctypes.c_int()
    rc = lib.odtpu_parse_voc_xml(
        path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(boxes),
        ctypes.byref(diff), ctypes.byref(names), ctypes.byref(n),
    )
    if rc != 0:
        return None
    nb = n.value
    bx = np.ctypeslib.as_array(boxes, shape=(nb, 4)).copy() if nb else np.zeros((0, 4), np.float32)
    df = np.ctypeslib.as_array(diff, shape=(nb,)).astype(bool).copy() if nb else np.zeros(0, bool)
    raw = ctypes.cast(names, ctypes.c_void_p)
    name_list = []
    if nb:
        buf = ctypes.string_at(names)
        # names are NUL-separated; string_at stops at the first NUL, so walk
        offset = 0
        base = ctypes.cast(names, ctypes.POINTER(ctypes.c_char))
        for _ in range(nb):
            s = ctypes.string_at(ctypes.addressof(base.contents) + offset)
            name_list.append(s.decode())
            offset += len(s) + 1
        del buf
    for p in (boxes, diff):
        lib.odtpu_free(p)
    lib.odtpu_free(ctypes.cast(names, ctypes.c_void_p))
    del raw
    return w.value, h.value, bx, name_list, df


class Prefetcher:
    """Threaded decode+resize+pad pipeline over a path list."""

    def __init__(self, paths: List[str], canvas_hw: Tuple[int, int],
                 min_size: int = 600, max_size: int = 1333,
                 n_threads: int = 4, window: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self.canvas_hw = canvas_hw
        self._handle = lib.odtpu_prefetcher_create(
            arr, len(self._paths), canvas_hw[0], canvas_hw[1],
            min_size, max_size, n_threads, window,
        )

    def get(self, index: int):
        ch, cw = self.canvas_hw
        canvas = np.zeros((ch, cw, 3), np.uint8)
        scale = ctypes.c_float()
        sw = ctypes.c_int()
        sh = ctypes.c_int()
        rc = self._lib.odtpu_prefetcher_get(
            self._handle, index,
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(scale), ctypes.byref(sw), ctypes.byref(sh),
        )
        if rc != 0:
            raise IOError(f"prefetch failed for item {index} (rc={rc})")
        return canvas, scale.value, (sw.value, sh.value)

    def close(self):
        if self._handle:
            self._lib.odtpu_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
