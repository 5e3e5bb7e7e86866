"""ctypes bindings for the native .osu featurizer (native/osu_native.cpp).

The native library parses a beatmap file and expands it straight to (T, 19)
feature rows without touching Python objects — and ctypes calls release the
GIL, so the threaded DataLoader's workers genuinely run in parallel. Falls back
transparently to the pure-Python path (beatmap parser + featurize.py) when the
library hasn't been built.

Build: `python -m osu_diffusion_tpu.native.build` (or `make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False

LIB_NAME = "libosu_native.so"


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), LIB_NAME)


def load_library(path: str | None = None):
    """Load (and cache) the native library; returns None if unavailable."""
    global _LIB, _LIB_TRIED
    if _LIB is not None:
        return _LIB
    if _LIB_TRIED and path is None:
        return None
    _LIB_TRIED = True
    candidate = path or _lib_path()
    if not os.path.isfile(candidate):
        return None
    try:
        lib = ctypes.CDLL(candidate)
    except OSError:
        return None
    lib.osu_featurize_file.restype = ctypes.c_int
    lib.osu_featurize_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.osu_featurize_buffer.restype = ctypes.c_int
    lib.osu_featurize_buffer.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.osu_free.restype = None
    lib.osu_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _collect(lib, status: int, data_ptr, rows) -> np.ndarray:
    if status != 0:
        raise RuntimeError(f"osu_native featurize failed with status {status}")
    n = rows.value
    if n == 0:
        return np.zeros((0, 19), dtype=np.float32)
    arr = np.ctypeslib.as_array(data_ptr, shape=(n, 19)).copy()
    lib.osu_free(data_ptr)
    return arr


def featurize_file(path: str) -> np.ndarray:
    """(T, 19) float32 feature rows for a .osu file via the native parser."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built; run python -m osu_diffusion_tpu.native.build")
    data_ptr = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int(0)
    status = lib.osu_featurize_file(
        os.fsencode(path), ctypes.byref(data_ptr), ctypes.byref(rows)
    )
    return _collect(lib, status, data_ptr, rows)


def featurize_text(text: str) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built; run python -m osu_diffusion_tpu.native.build")
    raw = text.encode("utf-8")
    data_ptr = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_int(0)
    status = lib.osu_featurize_buffer(
        raw, len(raw), ctypes.byref(data_ptr), ctypes.byref(rows)
    )
    return _collect(lib, status, data_ptr, rows)
