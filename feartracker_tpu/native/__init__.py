"""Native (C++) host engine bindings via ctypes.

Builds ``libcropengine.so`` from source on first import if missing (g++;
pybind11 is not available in this environment, ctypes is the binding layer).
Falls back cleanly: ``available()`` is False when no compiler exists, and
callers keep their pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "crop_engine.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libcropengine.so")
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC",
        "-std=c++17", "-pthread", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception as e:  # no compiler / load failure → python fallback
        _build_error = str(e)
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.crop_resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, f32p, f32p, f32p, f32p,
    ]
    lib.crop_resize_normalize.restype = None
    lib.crop_resize_normalize_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, f32p, f32p, f32p, f32p, ctypes.c_int,
    ]
    lib.crop_resize_normalize_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_NO_NORM_MEAN = np.zeros(3, np.float32)
_NO_NORM_STD = np.ones(3, np.float32)


def crop_resize_normalize(
    image: np.ndarray,
    window: np.ndarray,
    out_size: int,
    pad_color: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Fused crop+pad+resize(+normalize) of one HWC uint8 frame. ``window``
    is [x, y, w, h] in frame coords (may extend past the frame)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native crop engine unavailable: {_build_error}")
    image = np.ascontiguousarray(image, np.uint8)
    H, W, C = image.shape
    if C != 3:
        raise ValueError(f"native crop engine supports RGB (C=3) only, got C={C}")
    out = np.empty((out_size, out_size, C), np.float32)
    mean = _NO_NORM_MEAN if mean is None else np.asarray(mean, np.float32)
    inv_std = _NO_NORM_STD if std is None else (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    lib.crop_resize_normalize(
        image, H, W, C,
        np.ascontiguousarray(window, np.float32), out_size,
        np.ascontiguousarray(pad_color, np.float32),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(inv_std, np.float32),
        out,
    )
    return out


def crop_resize_normalize_batch(
    images: np.ndarray,
    windows: np.ndarray,
    out_size: int,
    pad_colors: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """Batched over (N, H, W, C) frames with per-frame windows/pad colors."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native crop engine unavailable: {_build_error}")
    images = np.ascontiguousarray(images, np.uint8)
    N, H, W, C = images.shape
    if C != 3:
        raise ValueError(f"native crop engine supports RGB (C=3) only, got C={C}")
    out = np.empty((N, out_size, out_size, C), np.float32)
    mean = _NO_NORM_MEAN if mean is None else np.asarray(mean, np.float32)
    inv_std = _NO_NORM_STD if std is None else (1.0 / np.asarray(std, np.float32)).astype(np.float32)
    lib.crop_resize_normalize_batch(
        images, N, H, W, C,
        np.ascontiguousarray(windows, np.float32), out_size,
        np.ascontiguousarray(pad_colors, np.float32),
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(inv_std, np.float32),
        out, num_threads,
    )
    return out
