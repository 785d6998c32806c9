"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas on TPU; the host-side heavy lifting --
today the binned-SAH BVH build over 100k+ primitives -- is C++ (the
reference's equivalent is its Rust build, src/bvh.rs:26-144). The shared
library is compiled on first use with g++ (no pybind11 in this image; plain
C ABI + ctypes) and cached next to the source; any failure falls back to
the numpy builder in ops/bvh.py, which is also the correctness oracle for
tests.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("rt_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bvh_builder.cpp")
_SO = os.environ.get(
    "RT_NATIVE_SO", os.path.join(_HERE, "librt_native.so")
)
_lock = threading.Lock()
_lib_cache = None


def _compile() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_native():
    global _lib_cache
    with _lock:
        if _lib_cache is not None:
            return _lib_cache
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _compile()
        lib = ctypes.CDLL(_SO)
        lib.rt_build_bvh.restype = ctypes.c_int64
        lib.rt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # amin
            ctypes.POINTER(ctypes.c_double),  # amax
            ctypes.c_int64,  # n
            ctypes.c_int32,  # leaf_size
            ctypes.c_int32,  # num_bins
            ctypes.POINTER(ctypes.c_int32),  # prim_order
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_int32),  # node_left
            ctypes.POINTER(ctypes.c_int32),  # node_right
            ctypes.POINTER(ctypes.c_uint8),  # node_is_leaf
            ctypes.c_int64,  # max_nodes
        ]
        _lib_cache = lib
        return lib


def native_build_bvh(amin: np.ndarray, amax: np.ndarray, leaf_size: int,
                     num_bins: int):
    """C++ binned-SAH build; returns the same _HostBvh as ops.bvh.build_bvh."""
    from ..ops.bvh import _HostBvh

    lib = load_native()
    n = amin.shape[0]
    amin = np.ascontiguousarray(amin, np.float64)
    amax = np.ascontiguousarray(amax, np.float64)
    max_nodes = max(2 * n, 2)
    prim_order = np.empty(n, np.int32)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_left = np.empty(max_nodes, np.int32)
    node_right = np.empty(max_nodes, np.int32)
    node_is_leaf = np.empty(max_nodes, np.uint8)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    count = lib.rt_build_bvh(
        p(amin, ctypes.c_double),
        p(amax, ctypes.c_double),
        n,
        leaf_size,
        num_bins,
        p(prim_order, ctypes.c_int32),
        p(node_min, ctypes.c_float),
        p(node_max, ctypes.c_float),
        p(node_left, ctypes.c_int32),
        p(node_right, ctypes.c_int32),
        p(node_is_leaf, ctypes.c_uint8),
        max_nodes,
    )
    if count <= 0:
        raise RuntimeError(f"rt_build_bvh failed: {count}")
    return _HostBvh(
        node_min=node_min[:count],
        node_max=node_max[:count],
        node_left=node_left[:count],
        node_right=node_right[:count],
        node_is_leaf=node_is_leaf[:count].astype(bool),
        prim_order=prim_order,
    )


__all__ = ["load_native", "native_build_bvh"]
