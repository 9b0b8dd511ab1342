"""Loader for the native C++ runtime components (ctypes, no pybind).

Builds ``native/mesh_extract.cpp`` into a shared library on first use (g++ is
part of the toolchain; a build failure silently falls back to the numpy
implementations so the framework stays importable anywhere).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "mesh_extract.cpp")
_LIB = os.path.join(_ROOT, "native", "libmesh_extract.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_mesh_extract_lib():
    """Return the loaded ctypes library or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mesh_extract_run.restype = ctypes.c_int
        lib.mesh_extract_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mesh_extract_free.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_marching_cubes(field: np.ndarray, iso: float = 0.0, n_threads: int = 0):
    """Native marching tetrahedra. Returns (verts [V,3] f32, tris [F,3] i32)
    or None when the native library is unavailable."""
    lib = get_mesh_extract_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, np.float32)
    X, Y, Z = f.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mesh_extract_run(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        X, Y, Z, ctypes.c_float(iso), n_threads,
        ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(tris_p), ctypes.byref(nt),
    )
    if rc != 0:
        return None
    try:
        if nv.value == 0:
            return (
                np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.int32),
            )
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tris_p, shape=(nt.value, 3)).copy()
    finally:
        lib.mesh_extract_free(verts_p, tris_p)
    return verts, tris
