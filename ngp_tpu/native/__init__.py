"""Native (C++) host-side components, loaded via ctypes.

Replaces the reference's binary Python deps that are CUDA/host C++
underneath: `pysdf` (mesh signed distances, sdf/provider.py:52) and
`mcubes` (marching cubes, nerf/utils.py:196). Compiled on first use
with the in-tree Makefile; the .so is cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libngp_native.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        sources = [os.path.join(_DIR, f) for f in ("sdf_mesh.cpp", "marching.cpp")]
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in sources
        ):
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sdf_build.restype = ctypes.c_void_p
        lib.sdf_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.sdf_query.restype = None
        lib.sdf_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.sdf_free.argtypes = [ctypes.c_void_p]
        lib.marching_tets.restype = ctypes.c_int
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int)), ctypes.POINTER(ctypes.c_int),
        ]
        lib.marching_free.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)
        ]
        _lib = lib
        return lib


class MeshSDF:
    """Signed-distance oracle for a triangle mesh (positive outside).

    Same contract as ``pysdf.SDF`` up to sign: the reference negates
    pysdf's output (sdf/provider.py:79, pysdf is positive-inside);
    this class returns positive-outside directly.
    """

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = _load()
        self._lib = lib
        v = np.ascontiguousarray(vertices, dtype=np.float32)
        f = np.ascontiguousarray(faces, dtype=np.int32)
        self._keepalive = (v, f)
        self._handle = ctypes.c_void_p(
            lib.sdf_build(
                v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
                f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
            )
        )

    def __call__(self, points: np.ndarray) -> np.ndarray:
        p = np.ascontiguousarray(points, dtype=np.float32)
        out = np.empty(len(p), dtype=np.float32)
        self._lib.sdf_query(
            self._handle,
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(p),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.sdf_free(self._handle)
            self._handle = None


def marching_cubes(grid: np.ndarray, iso: float = 0.0):
    """Extract the iso-surface of a dense [nx, ny, nz] scalar field.

    Returns (vertices [n, 3] float32 in grid-index coords, faces [m, 3]
    int32). Marching tetrahedra: watertight, no case tables.
    """
    g = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = g.shape
    lib = _load()
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    ret = lib.marching_tets(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp), ctypes.byref(nt),
    )
    if ret != 0:
        raise RuntimeError("marching_tets failed")
    if nv.value == 0:
        lib.marching_free(vp, tp)
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy()
    faces = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy()
    lib.marching_free(vp, tp)
    return verts, faces
