"""Wavefront OBJ loading for the scene compiler.

Parity with the reference's minimal loader (reference: src/loader.rs:12-59):
only `v` and `f` records are honored; face indices are 1-based (negative and
vt/vn slots ignored); quads triangulate as the (v1,v2,v3)+(v1,v3,v4) fan;
vertices are transformed to world space at load time.

A C++ fast path (native/objbvh.cpp) is used when the compiled library is
present; this module is the always-available fallback and the semantic
reference for tests.
"""
from __future__ import annotations

import numpy as np

from ..scene import matrix as mat44


import functools


@functools.lru_cache(maxsize=64)
def _parse_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    import os

    if os.environ.get("HANAMARU_NO_NATIVE") != "1":
        from ..scene import native

        parsed = native.parse_obj(path) if native.available() else None
        if parsed is not None:
            return parsed

    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    with open(path, "r") as f:
        for line in f:
            parts = line.split(" ")
            tag = parts[0]
            if tag == "v":
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:] if p.strip()]
                if len(idx) >= 3:
                    faces.append((idx[0], idx[1], idx[2]))
                if len(idx) == 4:  # quad fan (loader.rs:45-52)
                    faces.append((idx[0], idx[2], idx[3]))
    return (
        np.asarray(verts, dtype=np.float64).reshape(-1, 3),
        np.asarray(faces, dtype=np.int32).reshape(-1, 3),
    )


def load_obj(path: str, matrix: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Returns (vertices [V,3] f64 world-space, faces [F,3] i32).

    File parsing is cached; the model matrix is applied per call (the
    reference re-parses the file per placement attempt, loader.rs:12 —
    caching is a host-side speedup with identical results).
    """
    v, f = _parse_obj(path)
    if matrix is not None:
        v = mat44.transform_points(matrix, v)
    return v.copy() if matrix is None else v, f
