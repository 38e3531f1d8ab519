"""ctypes bindings for the native tile I/O core (tileio.cpp).

Built on first use with g++ (cached beside the source); every entry point has
a NumPy fallback so the framework works without a toolchain. Use
``segtpu.native.available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "tileio.cpp")
_SO = os.path.join(os.path.dirname(__file__), "build", "libtileio.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                     "-pthread", "-std=c++17", _SRC, "-o", _SO],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            ip = ctypes.POINTER(ctypes.c_int)
            fp = ctypes.POINTER(ctypes.c_float)
            dp = ctypes.POINTER(ctypes.c_double)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.tileio_extract_tiles_f32.argtypes = [
                fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ip, ip,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp]
            lib.tileio_extract_tiles_u8.argtypes = [
                u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ip, ip,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
            lib.tileio_merge_f32.argtypes = [
                fp, ip, ip, ctypes.c_int, ctypes.c_int, ctypes.c_int, dp,
                ctypes.c_int, ctypes.c_int, dp, dp]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _as_int32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def extract_tiles(image: np.ndarray, xs, ys, tile: int, m_top: int,
                  m_left: int) -> Optional[np.ndarray]:
    """All tiles (n, tile, tile, C) from the UNPADDED image with virtual
    reflect-101 borders. Returns None if the native lib is unavailable or the
    dtype is unsupported."""
    lib = _load()
    if lib is None:
        return None
    if image.ndim == 2:
        image = image[..., None]
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    xs = _as_int32(xs)
    ys = _as_int32(ys)
    n = len(xs)
    out = np.empty((n, tile, tile, c), dtype=image.dtype)

    ip = ctypes.POINTER(ctypes.c_int)
    if image.dtype == np.float32:
        fp = ctypes.POINTER(ctypes.c_float)
        lib.tileio_extract_tiles_f32(
            image.ctypes.data_as(fp), h, w, c,
            xs.ctypes.data_as(ip), ys.ctypes.data_as(ip), n, tile,
            m_top, m_left, out.ctypes.data_as(fp))
    elif image.dtype == np.uint8:
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tileio_extract_tiles_u8(
            image.ctypes.data_as(u8p), h, w, c,
            xs.ctypes.data_as(ip), ys.ctypes.data_as(ip), n, tile,
            m_top, m_left, out.ctypes.data_as(u8p))
    else:
        return None
    return out


def merge_tiles(tiles: np.ndarray, xs, ys, weight: np.ndarray, hp: int,
                wp: int) -> Optional[tuple]:
    """Accumulate weighted tiles into (acc, norm) float64 canvases.
    Returns None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tiles = np.ascontiguousarray(tiles, dtype=np.float32)
    n, tile, _, c = tiles.shape
    xs = _as_int32(xs)
    ys = _as_int32(ys)
    weight = np.ascontiguousarray(weight, dtype=np.float64)
    acc = np.zeros((hp, wp, c), dtype=np.float64)
    norm = np.zeros((hp, wp, c), dtype=np.float64)

    ip = ctypes.POINTER(ctypes.c_int)
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.tileio_merge_f32(
        tiles.ctypes.data_as(fp), xs.ctypes.data_as(ip),
        ys.ctypes.data_as(ip), n, tile, c, weight.ctypes.data_as(dp),
        hp, wp, acc.ctypes.data_as(dp), norm.ctypes.data_as(dp))
    return acc, norm
