"""ctypes bindings for the native IO library (native/gsvt_io.cc).

Builds on demand with g++ if the shared object is missing (the same
JIT-build pattern as the reference's CUDA kernel loader,
BigVGAN/alias_free_activation/cuda/load.py); everything degrades to the
pure-python paths when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgsvt_io.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(_DIR)), "native", "gsvt_io.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("clang++")
    if not cxx or not os.path.exists(_SRC):
        return False
    cmd = [cxx, "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread", "-Wall", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, or None (pure-python fallbacks apply)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gsvt_wav_batch.restype = ctypes.c_int
        lib.gsvt_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.gsvt_npy_batch.restype = ctypes.c_int
        lib.gsvt_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _paths_arr(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def wav_batch(paths: list[str], max_len: int, *, n_threads: int = 8):
    """Parallel WAV decode -> (out (n, max_len) f32 zero-padded, lengths,
    srs, status). None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, max_len), np.float32)
    lengths = np.zeros(n, np.int64)
    srs = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.gsvt_wav_batch(
        _paths_arr(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out, lengths, srs, status


def npy_batch(paths: list[str], max_rows: int, cols: int, *, n_threads: int = 8):
    """Parallel f32/f16 .npy decode -> (out (n, max_rows, cols) f32, rows,
    status). None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, max_rows, cols), np.float32)
    rows = np.zeros(n, np.int64)
    status = np.zeros(n, np.int32)
    lib.gsvt_npy_batch(
        _paths_arr(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_rows, cols,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return out, rows, status
