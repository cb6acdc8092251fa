"""Build + load the native IO library (lazy, cached, graceful fallback).

``g++ -O3 -shared -fPIC`` on first use; the .so lands next to the source.
All callers must handle ``load() is None`` and fall back to the pure-Python
parsers (the spec implementations).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vtkcache.cc")
_LIB = os.path.join(_DIR, "libvtkcache.so")

_lib: ctypes.CDLL | None = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile the shared library if missing/stale; returns its path."""
    if (not force and os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=240)
        return _LIB
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on any failure."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    c_char_p = ctypes.c_char_p
    c_long = ctypes.c_long
    c_void_p = ctypes.c_void_p

    lib.orttpu_last_error.restype = c_char_p
    lib.orttpu_vtk_mesh_parse.restype = c_void_p
    lib.orttpu_vtk_mesh_parse.argtypes = [c_char_p, c_long]
    lib.orttpu_mesh_num_cells.restype = c_long
    lib.orttpu_mesh_num_cells.argtypes = [c_void_p]
    lib.orttpu_mesh_num_tris.restype = c_long
    lib.orttpu_mesh_num_tris.argtypes = [c_void_p]
    lib.orttpu_mesh_fill.argtypes = [c_void_p] + [c_void_p] * 6
    lib.orttpu_mesh_free.argtypes = [c_void_p]

    lib.orttpu_vtk_time_parse.restype = c_void_p
    lib.orttpu_vtk_time_parse.argtypes = [c_char_p, c_long]
    lib.orttpu_time_num_points.restype = c_long
    lib.orttpu_time_num_points.argtypes = [c_void_p]
    lib.orttpu_time_fill.argtypes = [c_void_p] + [c_void_p] * 5
    lib.orttpu_time_free.argtypes = [c_void_p]

    lib.orttpu_stl_parse.restype = c_void_p
    lib.orttpu_stl_parse.argtypes = [c_char_p, c_long]
    lib.orttpu_stl_num_tris.restype = c_long
    lib.orttpu_stl_num_tris.argtypes = [c_void_p]
    lib.orttpu_stl_fill.argtypes = [c_void_p, c_void_p, c_void_p]
    lib.orttpu_stl_free.argtypes = [c_void_p]

    _lib = lib
    return _lib
