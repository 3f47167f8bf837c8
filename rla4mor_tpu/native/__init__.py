"""Native (C++) host kernels, loaded via ctypes.

The reference's host-side native layer is numba-JIT + the optional ffht C
extension (reference rla/srht.py). Here a small C++ library is compiled on
first use with g++ (-O3 -march=native -fopenmp) and loaded via ctypes; if
no compiler is available the pure-numpy fallback is used transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libfwht.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _DIR / "fwht.cpp"
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         str(src), "-o", str(_LIB_PATH)],
        ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
        ["c++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_LIB_PATH)],
    ]
    for cmd in cmds:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            for name, ctype in (("fht_f64", ctypes.c_double),
                                ("fht_f32", ctypes.c_float)):
                fn = getattr(lib, name)
                fn.restype = None
                fn.argtypes = [
                    ctypes.POINTER(ctype), ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int,
                ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fht_numpy(a: np.ndarray) -> None:
    n = a.shape[-1]
    h = 1
    while h < n:
        for i in range(0, n, h * 2):
            x = a[..., i : i + h].copy()
            y = a[..., i + h : i + 2 * h].copy()
            a[..., i : i + h] = x + y
            a[..., i + h : i + 2 * h] = x - y
        h *= 2


def fht_cpu(a: np.ndarray, n_threads: int = 0, normalize: bool = True
            ) -> np.ndarray:
    """Out-of-place host FWHT along the last axis (n = 2^d).

    Dispatches to the C++ library when available (the ffht-equivalent),
    otherwise a vectorized numpy butterfly. ``n_threads=0`` lets OpenMP
    choose.
    """
    a = np.ascontiguousarray(a)
    n = a.shape[-1]
    d = n.bit_length() - 1
    if (1 << d) != n:
        # explicit raise, not assert: this also guards the C++ butterfly's
        # memory safety (it indexes up to the next power of two) and must
        # survive python -O
        raise ValueError(
            f"fht_cpu requires a power-of-two last axis, got {n}"
        )
    if np.iscomplexobj(a):
        # FWHT is real-linear: transform the real and imaginary parts
        # separately (a float64 cast would silently drop the imaginary
        # part — the complex embeddings use this as the host oracle)
        return fht_cpu(a.real, n_threads, normalize) + 1j * fht_cpu(
            a.imag, n_threads, normalize
        )
    orig_dtype = a.dtype
    if a.dtype not in (np.float32, np.float64):
        a = a.astype(np.float64)
    out = a.copy()
    flat = out.reshape(-1, n)
    lib = _load()
    if lib is not None:
        if out.dtype == np.float64:
            lib.fht_f64(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                flat.shape[0], n, int(n_threads),
            )
        else:
            lib.fht_f32(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                flat.shape[0], n, int(n_threads),
            )
    else:
        _fht_numpy(flat)
    if normalize:
        out *= 2.0 ** (-d / 2.0)
    return out.astype(orig_dtype, copy=False)
