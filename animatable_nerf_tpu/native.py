"""ctypes loader for the native (C++) host-side ops in csrc/.

The shared library is built on first use with g++ (no Python.h /
pybind11 dependency — plain C ABI) and cached next to the sources.
Every native entry point has a pure-Python twin (render/mesh.py), so
import never fails hard: `mesh_native()` returns None when no compiler
is available and callers fall back.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "_mesh_native.so")
_SRC_PATH = os.path.join(_CSRC, "mesh_native.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC_PATH, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def mesh_native():
    """Load (building if needed) the native mesh library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.marching_tets.restype = ctypes.c_int
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # vol
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # D H W
            ctypes.c_float,  # level
            ctypes.POINTER(ctypes.c_float),  # spacing
            ctypes.POINTER(ctypes.c_float),  # origin
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mesh_native_free.argtypes = [ctypes.c_void_p]
        lib.voxelize_occupancy.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # verts
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,   # faces
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,     # attrs, C
            ctypes.POINTER(ctypes.c_float),                   # K
            ctypes.POINTER(ctypes.c_float),                   # R
            ctypes.POINTER(ctypes.c_float),                   # T
            ctypes.c_int, ctypes.c_int,                       # H, W
            ctypes.POINTER(ctypes.c_float),                   # out_attr
            ctypes.POINTER(ctypes.c_float),                   # out_depth
            ctypes.POINTER(ctypes.c_uint8),                   # out_mask
        ]
        _lib = lib
        return _lib


def marching_cubes_native(volume, level, spacing=(1.0, 1.0, 1.0),
                          origin=(0.0, 0.0, 0.0)):
    """Native isosurface extraction; returns (verts, faces) or None when
    the native library is unavailable."""
    lib = mesh_native()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    D, H, W = vol.shape
    sp = np.asarray(spacing, np.float32)
    org = np.asarray(origin, np.float32)
    pv = ctypes.POINTER(ctypes.c_float)()
    pf = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.marching_tets(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        D, H, W, ctypes.c_float(float(level)),
        sp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        org.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(pv), ctypes.byref(pf),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int64))
        verts = np.ctypeslib.as_array(pv, shape=(nv.value, 3)).copy()
        if nf.value:
            faces = np.ctypeslib.as_array(pf, shape=(nf.value, 3)).copy()
        else:
            faces = np.zeros((0, 3), np.int64)
        return verts, faces
    finally:
        if nv.value:
            lib.mesh_native_free(pv)
        if nf.value:
            lib.mesh_native_free(pf)


def rasterize_mesh_native(verts, faces, attrs, K, R, T, H, W):
    """Z-buffered triangle rasterization with per-vertex attribute
    interpolation (pytorch3d-renderer replacement for UV prebaking).
    Returns {attr (H,W,C), depth (H,W), mask (H,W)} or None when the
    native library is unavailable."""
    lib = mesh_native()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    attrs = np.ascontiguousarray(attrs, np.float32)
    C = attrs.shape[1]
    Kc = np.ascontiguousarray(K, np.float32)
    Rc = np.ascontiguousarray(R, np.float32)
    Tc = np.ascontiguousarray(np.asarray(T, np.float32).reshape(3))
    out_attr = np.zeros((H, W, C), np.float32)
    out_depth = np.zeros((H, W), np.float32)
    out_mask = np.zeros((H, W), np.uint8)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.rasterize_mesh(
        verts.ctypes.data_as(fp), ctypes.c_int64(len(verts)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(faces)),
        attrs.ctypes.data_as(fp), C,
        Kc.ctypes.data_as(fp), Rc.ctypes.data_as(fp), Tc.ctypes.data_as(fp),
        H, W,
        out_attr.ctypes.data_as(fp), out_depth.ctypes.data_as(fp),
        out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return {"attr": out_attr, "depth": out_depth, "mask": out_mask}


def voxelize_occupancy_native(points, bounds, shape):
    """Point cloud -> uint8 occupancy grid (ply_to_occupancy equivalent);
    returns the grid or None when the native library is unavailable."""
    lib = mesh_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    b = np.ascontiguousarray(np.asarray(bounds, np.float32).reshape(6))
    D, H, W = shape
    grid = np.zeros((D, H, W), np.uint8)
    lib.voxelize_occupancy(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(pts)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        D, H, W,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return grid
