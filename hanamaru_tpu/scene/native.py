"""ctypes bindings for the C++ scene-compile fast path (native/objbvh.cpp).

Loads native/libobjbvh.so when present; callers fall back to the pure
Python implementations otherwise.  Both paths produce identical arrays
(tests cross-check them).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    for cand in (
        os.path.join(here, "..", "..", "native", "libobjbvh.so"),
        os.environ.get("HANAMARU_NATIVE", ""),
    ):
        if cand and os.path.isfile(cand):
            return cand
    return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.obj_parse.restype = ctypes.c_void_p
    lib.obj_parse.argtypes = [ctypes.c_char_p]
    lib.obj_num_verts.restype = ctypes.c_int64
    lib.obj_num_verts.argtypes = [ctypes.c_void_p]
    lib.obj_num_faces.restype = ctypes.c_int64
    lib.obj_num_faces.argtypes = [ctypes.c_void_p]
    lib.obj_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.obj_free.argtypes = [ctypes.c_void_p]
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.bvh_num_nodes.restype = ctypes.c_int64
    lib.bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.bvh_depth.restype = ctypes.c_int32
    lib.bvh_depth.argtypes = [ctypes.c_void_p]
    lib.bvh_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "bvh_octant_links"):  # newer library builds only
        lib.bvh_octant_links.argtypes = [ctypes.c_int64] + [ctypes.c_void_p] * 7
    if hasattr(lib, "bvh_build_sah"):
        lib.bvh_build_sah.restype = ctypes.c_void_p
        lib.bvh_build_sah.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.sah_num_nodes.restype = ctypes.c_int64
        lib.sah_num_nodes.argtypes = [ctypes.c_void_p]
        lib.sah_depth.restype = ctypes.c_int32
        lib.sah_depth.argtypes = [ctypes.c_void_p]
        lib.sah_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
        lib.sah_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def parse_obj(path: str) -> Optional[tuple[np.ndarray, np.ndarray]]:
    lib = load()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    nv, nf = lib.obj_num_verts(h), lib.obj_num_faces(h)
    verts = np.empty((nv, 3), np.float64)
    faces = np.empty((nf, 3), np.int32)
    lib.obj_copy(
        h,
        verts.ctypes.data_as(ctypes.c_void_p),
        faces.ctypes.data_as(ctypes.c_void_p),
    )
    lib.obj_free(h)
    return verts, faces


def build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray, sort_key: np.ndarray):
    """Returns a FlatBvh (scene.bvh) or None if the library is absent."""
    lib = load()
    if lib is None:
        return None
    from .bvh import FlatBvh

    n = len(aabb_min)
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    key = np.ascontiguousarray(sort_key, np.float64)
    h = lib.bvh_build(
        n,
        amin.ctypes.data_as(ctypes.c_void_p),
        amax.ctypes.data_as(ctypes.c_void_p),
        key.ctypes.data_as(ctypes.c_void_p),
    )
    nn = lib.bvh_num_nodes(h)
    mins = np.empty((nn, 3), np.float32)
    maxs = np.empty((nn, 3), np.float32)
    hit = np.empty((nn,), np.int32)
    miss = np.empty((nn,), np.int32)
    first = np.empty((nn,), np.int32)
    count = np.empty((nn,), np.int32)
    order = np.empty((n,), np.int32)
    lib.bvh_copy(
        h,
        *(a.ctypes.data_as(ctypes.c_void_p) for a in (mins, maxs, hit, miss, first, count, order)),
    )
    depth = lib.bvh_depth(h)
    lib.bvh_free(h)
    return FlatBvh(mins, maxs, hit, miss, first, count, order, depth)


def build_bvh_sah(aabb_min: np.ndarray, aabb_max: np.ndarray):
    """Native binned-SAH build; None if the library/symbol is absent."""
    lib = load()
    if lib is None or not hasattr(lib, "bvh_build_sah"):
        return None
    from .bvh import FlatBvh

    n = len(aabb_min)
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    h = lib.bvh_build_sah(
        n,
        amin.ctypes.data_as(ctypes.c_void_p),
        amax.ctypes.data_as(ctypes.c_void_p),
    )
    nn = lib.sah_num_nodes(h)
    mins = np.empty((nn, 3), np.float32)
    maxs = np.empty((nn, 3), np.float32)
    hit = np.empty((nn,), np.int32)
    miss = np.empty((nn,), np.int32)
    first = np.empty((nn,), np.int32)
    count = np.empty((nn,), np.int32)
    order = np.empty((n,), np.int32)
    lib.sah_copy(
        h,
        *(a.ctypes.data_as(ctypes.c_void_p)
          for a in (mins, maxs, hit, miss, first, count, order)),
    )
    depth = lib.sah_depth(h)
    lib.sah_free(h)
    return FlatBvh(mins, maxs, hit, miss, first, count, order, depth)


def octant_links(flat) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Native per-octant re-threading; None if the library (or the newer
    symbol) is absent — callers fall back to scene.bvh.octant_links_py."""
    lib = load()
    if lib is None or not hasattr(lib, "bvh_octant_links"):
        return None
    n = len(flat.hit_link)
    mins = np.ascontiguousarray(flat.aabb_min, np.float32)
    maxs = np.ascontiguousarray(flat.aabb_max, np.float32)
    hit = np.ascontiguousarray(flat.hit_link, np.int32)
    miss = np.ascontiguousarray(flat.miss_link, np.int32)
    count = np.ascontiguousarray(flat.count, np.int32)
    hit8 = np.empty((8, n), np.int32)
    miss8 = np.empty((8, n), np.int32)
    lib.bvh_octant_links(
        n,
        *(a.ctypes.data_as(ctypes.c_void_p)
          for a in (mins, maxs, hit, miss, count, hit8, miss8)),
    )
    return hit8, miss8
