"""Native (C++) eval operators with ctypes bindings.

Build-on-first-import: ``evalops.cpp`` is compiled with the system C++ compiler
into ``_evalops.so`` next to this file (cached; rebuilt when the source is newer).
If no toolchain is available the import still succeeds with ``AVAILABLE = False``
and callers fall back to the scipy implementations (``wt_pse_tpu.ops.metrics`` /
``ops.postprocess``), which remain the behavioral oracle.

Exposed:
  largest_component_fill_holes_native(mask)  -> cleaned uint8 mask
  edt_native(mask)                           -> float32 distances to nearest ON
  surface_distances_native(a, b)             -> 1-D float32 distances (medpy
                                                semantics), raises on empty input
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "evalops.cpp")
_LIB = os.path.join(_HERE, "_evalops.so")

AVAILABLE = False
_lib = None


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load():
    global _lib, AVAILABLE
    if not _build():
        return
    lib = ctypes.CDLL(_LIB)
    lib.largest_component_fill_holes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
    lib.largest_component_fill_holes.restype = ctypes.c_int
    lib.edt.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.edt.restype = None
    lib.surface_distances.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.surface_distances.restype = ctypes.c_int64
    _lib = lib
    AVAILABLE = True


try:  # never break import for consumers without a toolchain
    _load()
except Exception:  # pragma: no cover
    AVAILABLE = False


def _as_u8(mask) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(mask) != 0, dtype=np.uint8)


def largest_component_fill_holes_native(mask) -> np.ndarray:
    m = _as_u8(mask).copy()
    h, w = m.shape
    _lib.largest_component_fill_holes(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    return m


def edt_native(mask) -> np.ndarray:
    m = _as_u8(mask)
    h, w = m.shape
    out = np.empty((h, w), np.float32)
    _lib.edt(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def surface_distances_native(a, b) -> np.ndarray:
    ma, mb = _as_u8(a), _as_u8(b)
    h, w = ma.shape
    out = np.empty(h * w, np.float32)
    n = _lib.surface_distances(
        ma.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        raise ValueError("empty mask")
    return out[:n]
