"""ctypes bindings for the native (C++/OpenMP) data-pipeline helpers.

Builds native/lib/libraytrace.so on first use if the toolchain is available;
callers fall back to the numpy implementation when the library can't be built
(tests/test_native.py checks numerical agreement between the two).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _ROOT / "native" / "lib" / "libraytrace.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["sh", str(_ROOT / "native" / "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.trace_rays.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int,
                               f32p, f32p, ctypes.c_int, f32p, f32p, i32p]
    lib.trace_rays.restype = None
    lib.rt_num_threads.restype = ctypes.c_int
    if hasattr(lib, "trace_prims"):
        lib.trace_prims.argtypes = [f32p, ctypes.c_int, f32p, f32p,
                                    ctypes.c_int, ctypes.c_int,
                                    f32p, f32p, i32p]
        lib.trace_prims.restype = None
    if hasattr(lib, "trace_tris"):
        lib.trace_tris.argtypes = [f32p, i32p, ctypes.c_int, f32p, f32p,
                                   ctypes.c_int, f32p, f32p, i32p]
        lib.trace_tris.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def prims_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "trace_prims")


def tris_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "trace_tris")


def trace_tris(tris: np.ndarray, tri_ids: np.ndarray, origins: np.ndarray,
               dirs: np.ndarray):
    """tris [nt,3,3] world-space triangles, tri_ids [nt] object id per
    triangle, origins/dirs [n,3] → (t [n] inf=miss, normals [n,3], ids [n]).
    BVH-accelerated; numpy oracle = sim.mesh.moller_trumbore."""
    lib = _load()
    assert lib is not None and hasattr(lib, "trace_tris"), \
        "native triangle tracer unavailable"
    n = origins.shape[0]
    tris = np.ascontiguousarray(tris, np.float32).reshape(-1, 9)
    tri_ids = np.ascontiguousarray(tri_ids, np.int32)
    origins = np.ascontiguousarray(origins, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    t = np.empty(n, np.float32)
    normals = np.empty((n, 3), np.float32)
    ids = np.empty(n, np.int32)
    lib.trace_tris(tris, tri_ids, len(tris), origins, dirs, n,
                   t, normals, ids)
    return np.where(t >= 1e29, np.inf, t), normals, ids


def trace_prims(prims: np.ndarray, origins: np.ndarray, dirs: np.ndarray,
                with_table: bool = True):
    """prims [np,16] ([kind, R(9), t(3), params(3)]), origins/dirs [n,3] →
    (t [n] inf=miss, normals [n,3], ids [n]). Same contract as
    sim.objects.PrimScene.trace (the numpy oracle)."""
    lib = _load()
    assert lib is not None and hasattr(lib, "trace_prims"), \
        "native prim tracer unavailable"
    n = origins.shape[0]
    prims = np.ascontiguousarray(prims, np.float32).reshape(-1, 16)
    origins = np.ascontiguousarray(origins, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    t = np.empty(n, np.float32)
    normals = np.empty((n, 3), np.float32)
    ids = np.empty(n, np.int32)
    lib.trace_prims(prims, len(prims), origins, dirs, n,
                    1 if with_table else 0, t, normals, ids)
    return np.where(t >= 1e29, np.inf, t), normals, ids


def trace_rays(spheres: np.ndarray, boxes: np.ndarray, origins: np.ndarray,
               dirs: np.ndarray):
    """spheres [ns,4], boxes [nb,6], origins/dirs [n,3] → (t [n] with inf for
    misses, normals [n,3], ids [n]). Same contract as Scene.trace."""
    lib = _load()
    assert lib is not None, "native raytracer unavailable"
    n = origins.shape[0]
    spheres = np.ascontiguousarray(spheres, np.float32).reshape(-1, 4)
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 6)
    origins = np.ascontiguousarray(origins, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    t = np.empty(n, np.float32)
    normals = np.empty((n, 3), np.float32)
    ids = np.empty(n, np.int32)
    lib.trace_rays(spheres, len(spheres), boxes, len(boxes), origins, dirs,
                   n, t, normals, ids)
    t = np.where(t >= 1e29, np.inf, t)
    return t, normals, ids
