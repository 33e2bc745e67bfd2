"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA; these cover the host side where the reference
uses C++ (molecule perception, IO).  Built on first use with g++ if no
shared object is present; pure-Python fallbacks keep everything working
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_gnina_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_DIR, "perceive.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO) <
                                       os.path.getmtime(
                                           os.path.join(_DIR, "perceive.cpp"))):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.perceive_bonds.restype = ctypes.c_int
        lib.perceive_bonds.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def perceive_bonds_native(coords: np.ndarray, radii: np.ndarray,
                          anums: np.ndarray, tolerance: float = 0.45
                          ) -> Optional[np.ndarray]:
    """(P,2) bonded index pairs, or None if the native library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(anums)
    coords = np.ascontiguousarray(coords, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    anums = np.ascontiguousarray(anums, np.int32)
    max_pairs = max(8 * n, 1024)
    out = np.empty((max_pairs, 2), np.int32)
    cnt = lib.perceive_bonds(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        radii.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        anums.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, ctypes.c_float(tolerance),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_pairs)
    if cnt < 0:
        return None
    if cnt > max_pairs:  # extremely dense system; retry bigger
        max_pairs = cnt
        out = np.empty((max_pairs, 2), np.int32)
        cnt = lib.perceive_bonds(
            coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            radii.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            anums.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, ctypes.c_float(tolerance),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_pairs)
    return out[:cnt].copy()
