"""ctypes bindings for the native (C++) input-pipeline ops.

Loads ``native/libmmcm_image_ops.so``, building it with g++ on first use if
absent (cached thereafter). All entry points release the GIL (plain ctypes
calls), so the dataset's thread pool decodes and resizes in true parallel.

Falls back cleanly: ``available()`` gates every use; the PIL path in
data/images.py is the reference implementation and stays the default for
parity-critical evaluation.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmmcm_image_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "image_ops.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
             "-o", _SO_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native image ops build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.resize_bilinear_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int, ctypes.c_int,
            ]
            lib.resize_bilinear_u8.restype = None
            lib.resize_shortest_edge_center_crop_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                u8p, ctypes.c_int,
            ]
            lib.resize_shortest_edge_center_crop_u8.restype = None
            _lib = lib
        except OSError as e:  # pragma: no cover
            logger.warning("native image ops load failed: %s", e)
        return _lib


def available() -> bool:
    return _load() is not None


def resize_bilinear(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """HWC uint8 antialiased bilinear resize (PIL-compatible)."""
    lib = _load()
    assert lib is not None, "native ops unavailable"
    src = np.ascontiguousarray(src, np.uint8)
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.uint8)
    lib.resize_bilinear_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_h, out_w,
    )
    return dst


def resize_center_crop(src: np.ndarray, out: int) -> np.ndarray:
    """Shortest-edge resize + center crop to (out, out) in one native call."""
    lib = _load()
    assert lib is not None, "native ops unavailable"
    src = np.ascontiguousarray(src, np.uint8)
    h, w, c = src.shape
    dst = np.empty((out, out, c), np.uint8)
    lib.resize_shortest_edge_center_crop_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out,
    )
    return dst
