"""ctypes loader for the native graph-construction kernels.

Builds ``libgraph_ops.so`` from ``graph_ops.cpp`` on first import (g++), and
exposes NumPy-friendly wrappers.  If the toolchain is unavailable the module
exports ``None`` for each kernel and callers fall back to NumPy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_ops.cpp")
_SO = os.path.join(_DIR, "libgraph_ops.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    _lib = ctypes.CDLL(_SO)
    knn_sig = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    _lib.knn_neighbors.argtypes = knn_sig
    _lib.knn_neighbors_grid.argtypes = knn_sig
    _lib.guillard_coarsening.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8)]
    return _lib


try:
    _load()

    def knn_neighbors(x: np.ndarray, queries: np.ndarray, k: int,
                      exclude_self: bool = False) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float64)
        q = np.ascontiguousarray(queries, dtype=np.float64)
        out = np.empty((q.shape[0], k), dtype=np.int32)
        # grid-accelerated exact kNN for larger sets (O(N·k) expected);
        # plain brute force below the crossover
        fn = (_lib.knn_neighbors_grid
              if x.shape[0] > 2000 and x.shape[1] <= 4
              else _lib.knn_neighbors)
        fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.shape[0],
           q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), q.shape[0],
           x.shape[1], k, int(exclude_self),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def guillard_coarsening(senders: np.ndarray, num_nodes: int, k: int
                            ) -> np.ndarray:
        s = np.ascontiguousarray(senders, dtype=np.int32)
        out = np.empty(num_nodes, dtype=np.uint8)
        _lib.guillard_coarsening(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_nodes, k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

except Exception:  # toolchain unavailable → NumPy fallbacks in ops/
    knn_neighbors = None
    guillard_coarsening = None
