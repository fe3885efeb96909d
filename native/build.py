"""Build + load the native helper library (ctypes, no pybind11).

Compiled lazily on first use and cached next to the source; all consumers
fall back to pure numpy/JAX when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "svgir_native.cpp")
_LIB = os.path.join(_DIR, "libsvgir_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            cxx = os.environ.get("CXX", "g++")
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", _LIB, _SRC, "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.svgir_version.restype = ctypes.c_int
        assert lib.svgir_version() == 1
        _lib = lib
    except Exception as exc:  # toolchain missing / sandboxed: fall back
        sys.stderr.write(f"[svgir_tpu] native helpers unavailable ({exc}); "
                         "using numpy fallback\n")
        _lib = None
    return _lib


def morton3d(xyz, lo, inv_extent):
    """30-bit morton codes (numpy in/out); None if native lib unavailable."""
    import numpy as np
    lib = load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    codes = np.empty(n, np.uint32)
    lo = np.ascontiguousarray(lo, np.float32)
    inv = np.ascontiguousarray(inv_extent, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    up = ctypes.POINTER(ctypes.c_uint32)
    lib.svgir_morton3d(xyz.ctypes.data_as(fp), ctypes.c_int64(n),
                       lo.ctypes.data_as(fp), inv.ctypes.data_as(fp),
                       codes.ctypes.data_as(up))
    return codes


def deinterleave_f32(rows):
    """[n, k] f32 -> list of k [n] arrays via the threaded native pass."""
    import numpy as np
    lib = load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.float32)
    n, k = rows.shape
    cols = [np.empty(n, np.float32) for _ in range(k)]
    fp = ctypes.POINTER(ctypes.c_float)
    arr = (fp * k)(*[c.ctypes.data_as(fp) for c in cols])
    lib.svgir_deinterleave_f32(rows.ctypes.data_as(fp), ctypes.c_int64(n),
                               ctypes.c_int64(k), arr)
    return cols


def interleave_f32(cols):
    """list of k [n] f32 arrays -> [n, k] rows."""
    import numpy as np
    lib = load()
    if lib is None:
        return None
    cols = [np.ascontiguousarray(c, np.float32) for c in cols]
    n, k = len(cols[0]), len(cols)
    rows = np.empty((n, k), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    arr = (fp * k)(*[c.ctypes.data_as(fp) for c in cols])
    lib.svgir_interleave_f32(arr, ctypes.c_int64(n), ctypes.c_int64(k),
                             rows.ctypes.data_as(fp))
    return rows
