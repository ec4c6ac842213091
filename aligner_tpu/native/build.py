"""Lazy g++ build + ctypes bindings for the C++ MAS oracle."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "mas_cpu.cpp")
_LOCK = threading.Lock()
_LIB = None


def _build_dir() -> str:
    d = os.environ.get("ALIGNER_TPU_NATIVE_CACHE",
                       os.path.join(os.path.dirname(__file__), "_build"))
    os.makedirs(d, exist_ok=True)
    return d


def load_mas_cpu() -> ctypes.CDLL:
    """Compile (if needed) and load the native library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"mas_cpu_{tag}.so")
        if not os.path.exists(so):
            # unique temp per process: concurrent builders (other
            # processes; _LOCK only serializes threads) each compile to
            # their own file and atomically install via os.replace.
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_build_dir())
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-march=native", _SRC, "-o", tmp, "-lpthread"],
                    check=True, capture_output=True)
                os.replace(tmp, so)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so)
        lib.mas_maximum_path_batch.restype = ctypes.c_int
        lib.mas_maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_int32,
        ]
        _LIB = lib
        return lib


def maximum_path_cpp(value: np.ndarray, mask: np.ndarray,
                     n_threads: int = 0) -> np.ndarray:
    """Batched MAS on CPU via the C++ oracle.

    value, mask: [b, t_x, t_y] arrays; same length derivation as the
    reference wrapper (monotonic_align/__init__.py:18-19). Returns int32
    paths. n_threads=0 -> hardware concurrency.
    """
    lib = load_mas_cpu()
    value = np.ascontiguousarray((value * mask), dtype=np.float32)
    t_xs = np.ascontiguousarray(mask.sum(axis=1)[:, 0], dtype=np.int32)
    t_ys = np.ascontiguousarray(mask.sum(axis=2)[:, 0], dtype=np.int32)
    b, t_x_max, t_y_max = value.shape
    path = np.zeros((b, t_x_max, t_y_max), dtype=np.int32)
    rc = lib.mas_maximum_path_batch(
        value.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_x_max, t_y_max, np.float32(-1e9), n_threads)
    if rc != 0:
        raise ValueError(
            "mas_maximum_path_batch: invalid lengths (need 1 <= t_x <= t_y "
            "per item; derived from the mask)")
    return path
