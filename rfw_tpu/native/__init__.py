"""ctypes bindings for the native runtime library (librfw_native.so).

Builds on demand with make/g++ (no pybind11 in the image — C ABI + ctypes,
see native/src/bvh.cpp). Every entry point has a pure-Python fallback, so
the framework works without a toolchain; `available()` reports which path
is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "librfw_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        # always invoke make: a no-op when the .so is current, a rebuild
        # when src/ is newer (stale .so would miss newer entry points)
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
    except Exception:
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rfw_build_bvh_sah.restype = ctypes.c_int
    lib.rfw_build_bvh_sah.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p,
    ]
    lib.rfw_refit_bvh.restype = None
    lib.rfw_refit_bvh.argtypes = [
        ctypes.c_int, f32p, f32p, i32p, i32p, i32p, i32p, f32p, f32p,
    ]
    lib.rfw_skin_positions.restype = None
    lib.rfw_skin_positions.argtypes = [ctypes.c_int, f32p, i32p, f32p, f32p, f32p]
    lib.rfw_build_wide8.restype = ctypes.c_int
    lib.rfw_build_wide8.argtypes = [
        ctypes.c_int, f32p, f32p, i32p, i32p, i32p, i32p,
        ctypes.c_int, ctypes.c_int, f32p, i32p, i32p,
    ]
    if hasattr(lib, "rfw_build_widen"):  # absent only in stale .so builds
        lib.rfw_build_widen.restype = ctypes.c_int
        lib.rfw_build_widen.argtypes = [
            ctypes.c_int, f32p, f32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, i32p,
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh_sah_native(aabb_min: np.ndarray, aabb_max: np.ndarray, max_leaf: int = 4):
    """Native binned-SAH build; returns BvhNodes or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    from rfw_tpu.accel.bvh_cpu import BvhNodes

    n = aabb_min.shape[0]
    if n == 0:
        return None
    cap = max(2 * n, 2)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_left = np.zeros(cap, np.int32)
    node_right = np.zeros(cap, np.int32)
    node_count = np.zeros(cap, np.int32)
    order = np.empty(n, np.int32)
    n_nodes = lib.rfw_build_bvh_sah(
        np.ascontiguousarray(aabb_min, np.float32),
        np.ascontiguousarray(aabb_max, np.float32),
        n, max_leaf, node_min, node_max, node_left, node_right, node_count, order,
    )
    return BvhNodes(
        node_min=node_min[:n_nodes].copy(),
        node_max=node_max[:n_nodes].copy(),
        node_left=node_left[:n_nodes].copy(),
        node_right=node_right[:n_nodes].copy(),
        node_count=node_count[:n_nodes].copy(),
        prim_order=order,
    )


def refit_bvh_native(bvh, aabb_min: np.ndarray, aabb_max: np.ndarray) -> bool:
    """In-place native refit of node bounds; returns False if unavailable."""
    lib = _load()
    if lib is None:
        return False
    lib.rfw_refit_bvh(
        bvh.num_nodes,
        bvh.node_min, bvh.node_max, bvh.node_left, bvh.node_right,
        bvh.node_count, bvh.prim_order,
        np.ascontiguousarray(aabb_min, np.float32),
        np.ascontiguousarray(aabb_max, np.float32),
    )
    return True


def build_widen_native(bvh, tlas: bool, leaf_base_offset: int = 0,
                       depth: int = 3, root: int = 0):
    """Native wide supernode collapse ((1<<depth)-ary, subtree at `root`);
    returns (box, code, cnt) or None if the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "rfw_build_widen"):
        return None
    arity = 1 << depth
    n = bvh.num_nodes
    box = np.empty((n, 6 * arity), np.float32)
    code = np.empty((n, arity), np.int32)
    cnt = np.empty((n, arity), np.int32)
    s = lib.rfw_build_widen(
        n,
        np.ascontiguousarray(bvh.node_min, np.float32),
        np.ascontiguousarray(bvh.node_max, np.float32),
        np.ascontiguousarray(bvh.node_left, np.int32),
        np.ascontiguousarray(bvh.node_right, np.int32),
        np.ascontiguousarray(bvh.node_count, np.int32),
        np.ascontiguousarray(bvh.prim_order, np.int32),
        int(tlas), leaf_base_offset, depth, root, box, code, cnt,
    )
    if s < 0:
        return None
    return box[:s].copy(), code[:s].copy(), cnt[:s].copy()


def build_wide8_native(bvh, tlas: bool, leaf_base_offset: int = 0):
    """Native 8-wide supernode collapse; returns (box, code, cnt) or None."""
    return build_widen_native(bvh, tlas, leaf_base_offset, depth=3)


def skin_positions_native(
    positions: np.ndarray, joints: np.ndarray, weights: np.ndarray,
    joint_matrices: np.ndarray,
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    n = positions.shape[0]
    out = np.empty((n, 3), np.float32)
    lib.rfw_skin_positions(
        n,
        np.ascontiguousarray(positions, np.float32),
        np.ascontiguousarray(joints, np.int32),
        np.ascontiguousarray(weights, np.float32),
        np.ascontiguousarray(joint_matrices.reshape(-1, 16), np.float32),
        out,
    )
    return out
