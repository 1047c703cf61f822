"""ctypes bindings for the native preprocessing library.

Loads ``native/libwdimage.so`` (built with ``make -C native``; an
auto-build is attempted on first import). Every entry point has a pure
numpy/PIL fallback, so the framework runs without a compiler — the
native path exists because per-image PIL work is the host-side
bottleneck when feeding TPU-rate training (SURVEY.md: the reference's
DataLoader equivalent is single-threaded Python).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwdimage.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wd_version.restype = ctypes.c_int
        if lib.wd_version() != 1:
            return None
        lib.wd_batch_resize_pad_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.wd_batch_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.wd_batch_denormalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.wd_vertical_lines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_uint8,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def preferred() -> bool:
    """Measured on the 1-core bench host (best of 3, batch 256-258):
    resize+pad+normalize 45.5 ms native vs 112.3 ms PIL (2.5x),
    normalize 12.0 vs 65.4 ms (5.5x), denormalize 6.6 vs 55.1 ms (8.3x)
    — the fused single-pass C loop wins even WITHOUT OpenMP cores, so
    native is preferred whenever the library loads. ``WD_NATIVE=0``
    opts out."""
    return available() and os.environ.get("WD_NATIVE", "1") != "0"


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def batch_resize_pad_normalize(
    images: Sequence[np.ndarray], height: int, width: int
) -> np.ndarray:
    """list of uint8 HWC (variable size) -> float32 [N, height, width, C]
    in [-1, 1], white-padded."""
    lib = _load() if preferred() else None
    n = len(images)
    c = images[0].shape[2]
    if lib is None:
        from ..utils.images import normalize_to_unit, resize_and_pad

        return np.stack([
            normalize_to_unit(resize_and_pad(img, height, width)) for img in images
        ])
    flat = np.concatenate([np.ascontiguousarray(i, np.uint8).reshape(-1) for i in images])
    offsets = np.zeros(n, np.int64)
    shapes = np.zeros(2 * n, np.int32)
    off = 0
    for i, img in enumerate(images):
        offsets[i] = off
        shapes[2 * i] = img.shape[0]
        shapes[2 * i + 1] = img.shape[1]
        off += img.size
    out = np.empty((n, height, width, c), np.float32)
    lib.wd_batch_resize_pad_normalize(
        _ptr(flat, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
        _ptr(shapes, ctypes.c_int32), n, c,
        _ptr(out, ctypes.c_float), height, width,
    )
    return out


def batch_normalize(images: np.ndarray) -> np.ndarray:
    """uint8 [...] -> float32 [-1,1], same shape."""
    lib = _load() if preferred() else None
    if lib is None:
        return (images.astype(np.float32) / 255.0 - 0.5) / 0.5
    src = np.ascontiguousarray(images, np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.wd_batch_normalize(_ptr(src, ctypes.c_uint8), _ptr(out, ctypes.c_float), src.size)
    return out


def batch_denormalize(images: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 (round-to-nearest)."""
    lib = _load() if preferred() else None
    if lib is None:
        return (np.clip(images, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    src = np.ascontiguousarray(images, np.float32)
    out = np.empty(src.shape, np.uint8)
    lib.wd_batch_denormalize(_ptr(src, ctypes.c_float), _ptr(out, ctypes.c_uint8), src.size)
    return out


def vertical_lines(img: np.ndarray, xs: np.ndarray, value: int = 255) -> np.ndarray:
    """in-place vertical eraser lines; returns img."""
    lib = _load() if preferred() else None
    if lib is None:
        img[:, xs[(xs >= 0) & (xs < img.shape[1])]] = value
        return img
    assert img.flags["C_CONTIGUOUS"] and img.dtype == np.uint8
    xs32 = np.ascontiguousarray(xs, np.int32)
    h, w, c = img.shape
    lib.wd_vertical_lines(
        _ptr(img, ctypes.c_uint8), h, w, c, _ptr(xs32, ctypes.c_int32),
        len(xs32), value,
    )
    return img
