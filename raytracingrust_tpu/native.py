"""ctypes bridge to the native C++ host components (native/).

Auto-builds ``native/librtrt_native.so`` on first use when a toolchain is
available; silently falls back to the NumPy implementations when not (the
builders are output-identical — tests/test_native.py asserts it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtrt_native.so")
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rtrt_build_bvh.restype = ctypes.c_int32
    lib.rtrt_build_bvh.argtypes = [
        f32p, f32p, ctypes.c_int32, f32p, f32p, i32p, i32p, i32p,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def native_build_topology(mins: np.ndarray, maxs: np.ndarray):
    """Same contract as ops.bvh._build_topology; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = mins.shape[0]
    k = 2 * n - 1
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    node_min = np.empty((k, 3), np.float32)
    node_max = np.empty((k, 3), np.float32)
    prim = np.empty(k, np.int32)
    hit_link = np.empty(k, np.int32)
    miss_link = np.empty(k, np.int32)
    depth = ctypes.c_int32(0)
    count = lib.rtrt_build_bvh(
        mins, maxs, n, node_min, node_max, prim, hit_link, miss_link,
        ctypes.byref(depth),
    )
    if count != k:
        return None
    return node_min, node_max, prim, hit_link, miss_link, int(depth.value)
