"""Native (C++) host-runtime kernels with build-on-demand + ctypes binding.

Compiled lazily into libporotpu_native.so next to this file; all callers
fall back to pure numpy implementations when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libporotpu_native.so")
_SRC = os.path.join(_HERE, "aggregation.cpp")

_lib = None
_tried = False


def _build():
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        _SO,
        _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.greedy_aggregate.restype = ctypes.c_int64
        lib.greedy_aggregate.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.csr_to_ell.restype = None
        lib.csr_to_ell.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.csr_to_ell_f32.restype = None
        lib.csr_to_ell_f32.argtypes = lib.csr_to_ell.argtypes
        lib.collapse_node_graph.restype = None
        lib.collapse_node_graph.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def greedy_aggregate(indptr: np.ndarray, indices: np.ndarray, n: int):
    """Native greedy aggregation; returns (agg array, n_agg) or None."""
    lib = get_lib()
    if lib is None:
        return None
    agg = np.full(n, -1, dtype=np.int64)
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    ix = np.ascontiguousarray(indices, dtype=np.int32)
    na = lib.greedy_aggregate(
        ip.ctypes.data, ix.ctypes.data, n, agg.ctypes.data
    )
    return agg, int(na)
