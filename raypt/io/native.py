"""ctypes binding to the native host runtime (native/raypt_native.cpp).

Native components mirror what the reference keeps in C++ (Assimp import
+ the CPU midpoint BVH builder, SURVEY §2): fast OBJ parsing, smooth
normals, a reference-semantics midpoint BVH, and morton ordering. Every
entry point has a pure-Python fallback, so the framework works without
the compiled library; `available()` reports which path is active.

Build: `make -C native` (done automatically on first use if a compiler
is present).
"""
from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libraypt_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = C.CDLL(_SO)
    except OSError:
        return None

    lib.rn_free.argtypes = [C.c_void_p]
    lib.rn_load_obj.argtypes = [
        C.c_char_p,
        C.POINTER(C.POINTER(C.c_float)), C.POINTER(C.c_int),
        C.POINTER(C.POINTER(C.c_float)), C.POINTER(C.c_int),
        C.POINTER(C.POINTER(C.c_float)), C.POINTER(C.c_int),
        C.POINTER(C.POINTER(C.c_int)), C.POINTER(C.c_int),
        C.POINTER(C.c_int)]
    lib.rn_load_obj.restype = C.c_int
    lib.rn_smooth_normals.argtypes = [
        C.POINTER(C.c_float), C.c_int, C.POINTER(C.c_int), C.c_int,
        C.POINTER(C.c_float)]
    lib.rn_build_midpoint_bvh.argtypes = [
        C.POINTER(C.c_float), C.c_int, C.POINTER(C.c_int), C.c_int,
        C.POINTER(C.POINTER(C.c_float)), C.POINTER(C.POINTER(C.c_uint32)),
        C.POINTER(C.POINTER(C.c_uint32))]
    lib.rn_build_midpoint_bvh.restype = C.c_int
    lib.rn_morton_order.argtypes = [
        C.POINTER(C.c_float), C.c_int, C.POINTER(C.c_uint32),
        C.POINTER(C.c_int)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _take(ptr, count, dtype):
    """Copy a malloc'd native buffer into numpy and free it."""
    lib = _LIB
    arr = np.ctypeslib.as_array(
        C.cast(ptr, C.POINTER(C.c_uint8)),
        shape=(count * np.dtype(dtype).itemsize,)).view(dtype)[:count].copy()
    lib.rn_free(ptr)
    return arr


def load_obj_native(path: str):
    """Native OBJ parse -> dict like raypt.io.obj.load_obj (positions,
    normals, uvs, faces). Returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos_p = C.POINTER(C.c_float)()
    nrm_p = C.POINTER(C.c_float)()
    uv_p = C.POINTER(C.c_float)()
    f_p = C.POINTER(C.c_int)()
    nv = C.c_int(); nn = C.c_int(); nu = C.c_int(); nf = C.c_int()
    flags = C.c_int()
    rc = lib.rn_load_obj(path.encode(), C.byref(pos_p), C.byref(nv),
                         C.byref(nrm_p), C.byref(nn), C.byref(uv_p),
                         C.byref(nu), C.byref(f_p), C.byref(nf),
                         C.byref(flags))
    if rc < 0:
        return None
    if flags.value & 1 and (nn.value or nu.value):
        # file uses per-corner vt/vn indexing: the Python parser does
        # proper corner splitting; free buffers and decline
        for ptr in (pos_p, nrm_p, uv_p, f_p):
            lib.rn_free(ptr)
        return None
    positions = _take(pos_p, nv.value * 3, np.float32).reshape(-1, 3)
    normals_src = _take(nrm_p, nn.value * 3, np.float32).reshape(-1, 3)
    uvs_src = _take(uv_p, nu.value * 2, np.float32).reshape(-1, 2)
    faces = _take(f_p, nf.value * 3, np.int32).reshape(-1, 3).astype(np.int64)

    if len(normals_src) == len(positions):
        normals = normals_src
    else:
        normals = smooth_normals_native(positions, faces)
    uvs = (uvs_src if len(uvs_src) == len(positions)
           else np.zeros((len(positions), 2), np.float32))
    return {"positions": positions, "normals": normals, "uvs": uvs,
            "faces": faces}


def smooth_normals_native(positions: np.ndarray, faces: np.ndarray):
    lib = _load()
    if lib is None:
        from .obj import smooth_normals
        return smooth_normals(positions, faces)
    positions = np.ascontiguousarray(positions, np.float32)
    f32 = np.ascontiguousarray(faces, np.int32)
    out = np.zeros_like(positions)
    lib.rn_smooth_normals(
        positions.ctypes.data_as(C.POINTER(C.c_float)), len(positions),
        f32.ctypes.data_as(C.POINTER(C.c_int)), len(f32),
        out.ctypes.data_as(C.POINTER(C.c_float)))
    return out


def build_midpoint_bvh(positions: np.ndarray, faces: np.ndarray):
    """Reference-semantics CPU midpoint BVH (BVH.cpp:8-124 behavior).
    Returns dict(bounds (M,6), meta (M,2) [leaf: first,count / internal:
    left_child,0], order (F,)) or None without the library."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    f32 = np.ascontiguousarray(faces, np.int32)
    b_p = C.POINTER(C.c_float)()
    m_p = C.POINTER(C.c_uint32)()
    o_p = C.POINTER(C.c_uint32)()
    n = lib.rn_build_midpoint_bvh(
        positions.ctypes.data_as(C.POINTER(C.c_float)), len(positions),
        f32.ctypes.data_as(C.POINTER(C.c_int)), len(f32),
        C.byref(b_p), C.byref(m_p), C.byref(o_p))
    if n < 0:
        return None
    total = 2 * len(f32) - 1
    bounds = _take(b_p, total * 6, np.float32).reshape(-1, 6)
    meta = _take(m_p, total * 2, np.uint32).reshape(-1, 2)
    order = _take(o_p, len(f32), np.uint32)
    return {"bounds": bounds[:n] if False else bounds, "meta": meta,
            "order": order, "nodes_used": n}


def morton_order(centroids: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, np.float32)
    codes = np.zeros(len(c), np.uint32)
    order = np.zeros(len(c), np.int32)
    lib.rn_morton_order(c.ctypes.data_as(C.POINTER(C.c_float)), len(c),
                        codes.ctypes.data_as(C.POINTER(C.c_uint32)),
                        order.ctypes.data_as(C.POINTER(C.c_int)))
    return {"codes": codes, "order": order}
