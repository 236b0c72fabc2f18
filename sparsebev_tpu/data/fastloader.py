"""ctypes binding for the native C++ loader (csrc/fastloader.cpp): threaded
JPEG decode + resize/crop/flip straight into batch buffers.

The TPU-host counterpart of the reference's turbojpeg + multi-worker decode
(SURVEY.md input-pipeline bottleneck; loaders/pipelines/loading.py:48-51).
Falls back to the PIL path transparently when the library isn't built
(``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "csrc", "libfastloader.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.sbtpu_load_batch.restype = ctypes.c_int
    lib.sbtpu_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sbtpu_probe.restype = ctypes.c_int
    lib.sbtpu_probe.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.sbtpu_decode.restype = ctypes.c_int
    lib.sbtpu_decode.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def load_batch(paths: Sequence[str],
               resize_wh: Tuple[int, int],
               crop_xywh: Tuple[int, int, int, int],
               flip: bool = False,
               num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode + bicubic-resize to ``resize_wh=(W,H)`` + crop
    ``crop_xywh=(x, y, out_w, out_h)`` + optional hflip; returns
    [N, out_h, out_w, 3] BGR uint8, or None if the native lib is missing
    or any image failed."""
    lib = _find_lib()
    if lib is None:
        return None
    n = len(paths)
    cx, cy, ow, oh = crop_xywh
    out = np.empty((n, oh, ow, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.sbtpu_load_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        resize_wh[0], resize_wh[1], cx, cy, ow, oh,
        1 if flip else 0, num_threads)
    if ok != n:
        return None
    return out


def decode(path: str) -> Optional[np.ndarray]:
    """Plain decode to BGR uint8 [H, W, 3] (no resize)."""
    lib = _find_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.sbtpu_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.sbtpu_decode(path.encode(),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        w.value, h.value) != 0:
        return None
    return out
