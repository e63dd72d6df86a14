"""ctypes bindings for the native C++ data loader.

Builds ``ccvpe_tpu/native/libccvpe_dataloader.so`` on first use (cached) and
exposes:

    load_batch(paths, out_hw, n_threads)  -> (uint8 [N,H,W,3], statuses [N])
    resize_bilinear(img, out_hw)          -> uint8 [H,W,3]

The resampler reproduces Pillow's fixed-point bilinear algorithm
bit-for-bit, so the native path is interchangeable with the PIL path used by
checkpoint-parity evaluation.  Falls back (``available() == False``) if the
toolchain or libjpeg/libpng are missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libccvpe_dataloader.so")

_lib = None
_build_lock = threading.Lock()
_build_error: str | None = None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    with _build_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "dataloader.cc")
        if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, text=True)
            except (subprocess.CalledProcessError, OSError) as e:
                _build_error = getattr(e, "stderr", str(e)) or str(e)
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.ccvpe_load_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        lib.ccvpe_load_image.restype = ctypes.c_int
        lib.ccvpe_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.ccvpe_load_batch.restype = None
        lib.ccvpe_load_batch_fast.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.ccvpe_load_batch_fast.restype = None
        lib.ccvpe_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.ccvpe_resize_bilinear.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def load_batch(paths, out_hw: tuple[int, int], n_threads: int = 8,
               return_sizes: bool = False, fast: bool = False):
    """Decode + resize a batch of image files concurrently in C++.

    Returns (batch uint8 [N, H, W, 3], statuses int32 [N]); status != 0 means
    the file was unreadable (caller applies the blank-image fallback).
    With ``return_sizes`` also returns the pre-resize raw (h, w) per image
    as int32 [N, 2] — the VIGOR sampler rescales ground-truth offsets by the
    raw satellite size (reference ``datasets.py:140-141``).

    ``fast``: DCT-scaled JPEG decode (decode at the smallest M/8 scale that
    covers ``out_hw``, then Pillow-bilinear down).  2-4x faster on large
    panoramas; near- but not bit-identical to the full-decode path — for
    training feeds, never checkpoint-parity eval."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    h, w = out_hw
    out = np.empty((n, h, w, 3), np.uint8)
    statuses = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    if return_sizes or fast:
        raw_hw = np.zeros((n, 2), np.int32)
        lib.ccvpe_load_batch_fast(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            n_threads, statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            raw_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            1 if fast else 0)
        return (out, statuses, raw_hw) if return_sizes else (out, statuses)
    lib.ccvpe_load_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        n_threads, statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out, statuses


def resize_bilinear(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Pillow-exact bilinear resize of an RGB uint8 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    img = np.ascontiguousarray(img, np.uint8)
    in_h, in_w, c = img.shape
    assert c == 3
    h, w = out_hw
    out = np.empty((h, w, 3), np.uint8)
    lib.ccvpe_resize_bilinear(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), in_h, in_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    return out
