"""ctypes bindings for the native (C++) RGB-D batch loader.

The disk datasets use this when ``native/librgbd_loader.so`` is available
(built lazily with ``make -C native``): multithreaded libpng decode +
resize directly into the numpy batch buffers, replacing the per-file PIL
path. Falls back transparently to PIL when the library is missing or a
build toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librgbd_loader.so")

_lib = None
_tried = False


def _load_library(build: bool = True):
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and build and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rgbd_load_batch.restype = ctypes.c_int
    lib.rgbd_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def load_rgbd_batch(
    rgb_paths: Sequence[str],
    depth_paths: Sequence[str],
    height: int,
    width: int,
    depth_scale: float = 5000.0,
    num_threads: Optional[int] = None,
):
    """Decode+resize a window of frames natively.

    Returns (colors [n,H,W,3] float32 in 0..255, depths [n,H,W,1] float32
    meters) or None when the native library is unavailable.
    """
    lib = _load_library()
    if lib is None:
        return None
    n = len(rgb_paths)
    assert len(depth_paths) == n
    colors = np.empty((n, height, width, 3), np.float32)
    depths = np.empty((n, height, width, 1), np.float32)

    rgb_arr = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
    dep_arr = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
    threads = num_threads or min(8, os.cpu_count() or 1)
    ok = lib.rgbd_load_batch(
        rgb_arr,
        dep_arr,
        n,
        height,
        width,
        ctypes.c_float(depth_scale),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        threads,
    )
    if ok != n:
        return None
    return colors, depths
