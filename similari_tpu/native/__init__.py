"""Native (C++) runtime components with build-on-first-use + ctypes bindings.

Compiled with the system toolchain into a cached shared library; every entry
point has a pure-Python/scipy fallback, so the package works without a
compiler (`available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "lap.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("SIMILARI_TPU_CACHE", Path.home() / ".cache" / "similari_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"libsimilari_native_{tag}.so"
    if not lib_path.exists():
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            "-pthread",
            str(_SRC),
            "-o",
            str(lib_path) + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(str(lib_path) + ".tmp", lib_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    lib.lap_solve_max.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lap_solve_max.restype = ctypes.c_int
    lib.lap_solve_batch_max.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.lap_solve_batch_max.restype = ctypes.c_int
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def lap_max(weights: np.ndarray) -> np.ndarray:
    """Exact maximization LAP: weights[R, C] (R <= C) -> col per row [R]."""
    lib = _get_lib()
    w = np.ascontiguousarray(weights, np.float32)
    r, c = w.shape
    out = np.zeros((r,), np.int32)
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(w, maximize=True)
        out[rows] = cols.astype(np.int32)
        return out
    err = lib.lap_solve_max(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        r,
        c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if err:
        raise RuntimeError(f"lap_solve_max failed: {err}")
    return out


def lap_max_batch(weights: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Batched exact LAP: weights[B, R, C] -> cols [B, R] (thread pool)."""
    lib = _get_lib()
    w = np.ascontiguousarray(weights, np.float32)
    b, r, c = w.shape
    out = np.zeros((b, r), np.int32)
    if lib is None:
        for i in range(b):
            out[i] = lap_max(w[i])
        return out
    err = lib.lap_solve_batch_max(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b,
        r,
        c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    if err:
        raise RuntimeError(f"lap_solve_batch_max failed: {err}")
    return out
