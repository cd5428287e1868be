"""ctypes bindings for the threaded PNG batch codec (pngio.cpp).

Compiled on first use with g++ (-O3, zlib); the .so is cached next to the
source. Every entry point has a PIL fallback so the framework stays pure-
Python-capable (e.g. when no compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pngio.cpp")
_LIB = os.path.join(_DIR, "libpngio.so")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            # compile to a pid-unique temp and os.replace into place:
            # concurrent processes racing the first-use build must never
            # CDLL a half-written .so (which would poison _load_failed for
            # the whole process and silently fall back to PIL)
            tmp = f"{_LIB}.tmp.{os.getpid()}"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", tmp, "-lz"],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _LIB)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
        lib = ctypes.CDLL(_LIB)
        lib.encode_png_batch.restype = ctypes.c_int
        lib.encode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        lib.decode_png_batch.restype = ctypes.c_int
        lib.decode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.png_read_header.restype = ctypes.c_int
        lib.png_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _c_paths(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def encode_png_batch(images_u8: np.ndarray, paths: List[str], n_threads: int = 0) -> bool:
    """Write a uint8 NHWC (or NHW for grayscale) batch as PNGs. Returns True
    when the native path handled it."""
    lib = _load()
    imgs = np.ascontiguousarray(images_u8)
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    n, h, w, c = imgs.shape
    if lib is None or c not in (1, 3):
        return False
    rc = lib.encode_png_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, c,
        _c_paths(paths), n_threads,
    )
    return rc == 0


def png_header(path: str) -> Optional[tuple]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.png_read_header(path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)) != 0:
        return None
    return h.value, w.value, c.value


def decode_png_batch(paths: List[str], h: int, w: int, c: int, n_threads: int = 0) -> Optional[np.ndarray]:
    """Read same-geometry PNGs into one uint8 NHWC array (None → fall back)."""
    lib = _load()
    if lib is None or c not in (1, 3):
        return None
    out = np.empty((len(paths), h, w, c), np.uint8)
    rc = lib.decode_png_batch(
        _c_paths(paths), len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, n_threads,
    )
    return out if rc == 0 else None
