"""ctypes bridge to the native OBJ parser (objloader.cpp).

Builds lazily with g++ on first use (cached as libobjloader.so next to the
source); falls back to None (-> Python parser) if the toolchain or build
fails, so the package never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "objloader.cpp")
_LIB = os.path.join(_HERE, "libobjloader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.obj_load.restype = ctypes.c_void_p
            lib.obj_load.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_long),
                                     ctypes.POINTER(ctypes.c_long)]
            lib.obj_copy.restype = None
            lib.obj_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]
            lib.obj_free.restype = None
            lib.obj_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def try_load(path: str):
    """Returns (verts f32[V,3], faces i32[T,3]) or None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    nv = ctypes.c_long()
    nf = ctypes.c_long()
    handle = lib.obj_load(path.encode(), ctypes.byref(nv), ctypes.byref(nf))
    if not handle:
        return None
    try:
        verts = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        lib.obj_copy(handle,
                     verts.ctypes.data_as(ctypes.c_void_p),
                     faces.ctypes.data_as(ctypes.c_void_p))
        return verts, faces
    finally:
        lib.obj_free(handle)
