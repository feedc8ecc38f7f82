"""ctypes binding for the native C++ decode runtime (runtime/cfen_loader.cpp).

Builds lazily on first use (`make -C runtime`) and caches the .so; all
callers fall back to the PIL path when the native library is unavailable,
so the framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libcfen_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _RUNTIME_DIR, "-s"],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.cfen_decode_batch_f32.restype = ctypes.c_int
        lib.cfen_decode_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.cfen_decode_rgb.restype = ctypes.c_int
        lib.cfen_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.cfen_encode_png.restype = ctypes.c_int
        lib.cfen_encode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.cfen_decode_rgb_mem.restype = ctypes.c_void_p
        lib.cfen_decode_rgb_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.cfen_encode_png_mem.restype = ctypes.c_void_p
        lib.cfen_encode_png_mem.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_size_t)]
        lib.cfen_free.restype = None
        lib.cfen_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: List[str], height: int, width: int,
                 threads: int = 0) -> Optional[np.ndarray]:
    """Decode + normalize a fixed-size batch natively.

    Returns [N,H,W,3] float32 in [-1,1], or None if the native path is
    unavailable or any image mismatches (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = threads or min(8, os.cpu_count() or 1)
    rc = lib.cfen_decode_batch_f32(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, threads)
    if rc != 0:
        return None
    return out


def encode_png(path: str, rgb: np.ndarray, compress_level: int = 1) -> bool:
    """Write an RGB8 [H,W,3] array as PNG natively; False -> caller uses PIL."""
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    rc = lib.cfen_encode_png(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        a.shape[1], a.shape[0], compress_level)
    return rc == 0


def decode_rgb_bytes(data: bytes) -> Optional[np.ndarray]:
    """Decode JPEG/PNG request bytes to an RGB8 [H,W,3] array (serving
    path, no filesystem); None -> caller falls back to PIL."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ptr = lib.cfen_decode_rgb_mem(data, len(data),
                                  ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        return None
    try:
        buf = ctypes.cast(ptr, ctypes.POINTER(
            ctypes.c_ubyte * (w.value * h.value * 3))).contents
        return np.frombuffer(buf, dtype=np.uint8).reshape(
            h.value, w.value, 3).copy()
    finally:
        lib.cfen_free(ptr)


def encode_png_bytes(rgb: np.ndarray,
                     compress_level: int = 1) -> Optional[bytes]:
    """Encode RGB8 [H,W,3] to PNG bytes natively; None -> PIL fallback."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    out_len = ctypes.c_size_t(0)
    ptr = lib.cfen_encode_png_mem(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        a.shape[1], a.shape[0], compress_level, ctypes.byref(out_len))
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.cfen_free(ptr)
