"""Host-side 4x4 affine transforms for scene construction.

Counterpart of the reference's Matrix44 (reference: src/matrix.rs:5-190).
Pure numpy — transforms are applied once at scene-compile time, exactly like
the reference bakes the model matrix into world-space vertices at load time
(reference: src/loader.rs:31).
"""
from __future__ import annotations

import numpy as np


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


def scale(sx: float, sy: float, sz: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[1, 1], m[2, 2] = sx, sy, sz
    return m


def scale_linear(s: float) -> np.ndarray:
    return scale(s, s, s)


def rotate_x(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float64)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rotate_y(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rotate_z(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def translate(tx: float, ty: float, tz: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[0, 3], m[1, 3], m[2, 3] = tx, ty, tz
    return m


def transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply an affine matrix to [N,3] points, with translation
    (reference: matrix.rs:180-190)."""
    return pts @ m[:3, :3].T + m[:3, 3]


def inverse(m: np.ndarray) -> np.ndarray:
    """4x4 inverse; identity for singular inputs like the reference's
    Gauss-Jordan routine (matrix.rs:80-145)."""
    try:
        out = np.linalg.inv(np.asarray(m, np.float64))
    except np.linalg.LinAlgError:
        return identity()
    if not np.all(np.isfinite(out)):
        return identity()
    return out
