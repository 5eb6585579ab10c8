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


def _src_hash() -> str:
    import hashlib

    src = os.path.join(_NATIVE_DIR, "image_ops.cpp")
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "image_ops.cpp")
    if not os.path.exists(src):
        return False
    base = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
            "-o", _SO_PATH, src]
    # Prefer the libjpeg-backed build (fused scaled decode); fall back to the
    # resize-only build on hosts without libjpeg dev files.
    for extra in (["-DMMCM_HAVE_JPEG", "-ljpeg"], []):
        try:
            subprocess.run(
                base + extra, check=True, capture_output=True, timeout=120
            )
            # record what was compiled: staleness is keyed on source content,
            # not mtimes (a fresh clone gives source and .so identical
            # checkout times, and a foreign prebuilt .so compiled with
            # -march=native on another CPU would SIGILL — the hash mismatch
            # forces a local rebuild instead)
            with open(_SO_PATH + ".srchash", "w") as f:
                f.write(_src_hash())
            return True
        except Exception as e:  # pragma: no cover
            logger.warning("native image ops build (%s) failed: %s", extra, e)
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "image_ops.cpp")
        stale = True
        if os.path.exists(_SO_PATH) and os.path.exists(src):
            try:
                with open(_SO_PATH + ".srchash") as f:
                    stale = f.read().strip() != _src_hash()
            except OSError:
                stale = True  # no build record -> untrusted binary; rebuild
        if (not os.path.exists(_SO_PATH) or stale) and not _build():
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
            lib.has_jpeg.argtypes = []
            lib.has_jpeg.restype = ctypes.c_int
            if lib.has_jpeg():
                lib.decode_jpeg_resize_crop_u8.argtypes = [
                    u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
                ]
                lib.decode_jpeg_resize_crop_u8.restype = ctypes.c_int
            _lib = lib
        except OSError as e:  # pragma: no cover
            logger.warning("native image ops load failed: %s", e)
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_available() -> bool:
    lib = _load()
    return lib is not None and bool(lib.has_jpeg())


def decode_jpeg_resize_crop(
    data: bytes, out: int, scaled: bool = True
) -> Optional[np.ndarray]:
    """JPEG bytes -> (out, out, 3) uint8 RGB crop in one native call.

    ``scaled`` enables DCT-domain M/8 downscaling during decode (shortest
    edge kept >= ``out``; the antialiased resize finishes the job) — ~2-4x
    cheaper than full decode for typical social-media images. With
    ``scaled=False`` the decode is full-resolution and bit-identical to the
    PIL path (both wrap the same libjpeg). Returns None on any decode
    failure so callers can fall back / degrade.
    """
    lib = _load()
    if lib is None or not lib.has_jpeg():
        return None
    dst = np.empty((out, out, 3), np.uint8)
    rc = lib.decode_jpeg_resize_crop_u8(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out,
        1 if scaled else 0,
    )
    return dst if rc == 0 else None


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
