"""Thin-lens camera ray generation, batched.

Semantics follow the reference camera (reference: src/camera.rs:45-107),
including the tan(full-fov) screen-height quirk baked in at compile time
(camera.rs:48, see scene/compile.py).  The lens disc sample uses the exact
inverse-CDF map instead of the reference's rejection loop (camera.rs:66-81)
— same uniform-disc distribution, no data-dependent loop, which is the
TPU-friendly formulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.compile import CameraArrays
from ..utils.vec import Vec2, Vec3


def sample_lens(u1, u2, lens_shape: str) -> Vec2:
    """Uniform point on the lens in [-1,1]^2 (square) or the unit disc."""
    if lens_shape == "square":
        return Vec2(2.0 * u1 - 1.0, 2.0 * u2 - 1.0)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    return Vec2(r * jnp.cos(phi), r * jnp.sin(phi))


def ray_with_dof(
    cam: CameraArrays, nc: Vec2, u1, u2, lens_shape: str = "circle"
) -> tuple[Vec3, Vec3]:
    """Depth-of-field primary ray (camera.rs:83-96)."""
    lens = sample_lens(u1, u2, lens_shape)
    lu = lens.x * cam.lens_radius
    lv = lens.y * cam.lens_radius
    lens_pos = cam.right * lu + cam.up * lv
    origin = cam.eye + lens_pos
    direction = (
        cam.plane_half_right * nc.x
        + cam.plane_half_up * nc.y
        + cam.forward * cam.focus_distance
        - lens_pos
    ).normalize()
    return origin, direction


def ray_pinhole(cam: CameraArrays, nc: Vec2) -> tuple[Vec3, Vec3]:
    """Pinhole ray for debug renders (camera.rs:98-107)."""
    zero = jnp.zeros_like(nc.x)
    origin = Vec3(zero + cam.eye.x, zero + cam.eye.y, zero + cam.eye.z)
    direction = (
        cam.plane_half_right * nc.x
        + cam.plane_half_up * nc.y
        + cam.forward * cam.focus_distance
    ).normalize()
    return origin, direction


def normalized_coords(
    width: int, height: int, supersampling: int, dtype=jnp.float32
) -> Vec2:
    """Normalized screen coords for every (pixel, subsample), flattened.

    Returns a Vec2 of shape [H*W*SS*SS] ordered (pixel-major, then the
    reference's sy/sx subpixel grid).  Matches renderer.rs:33-37 (y-flip)
    and renderer.rs:48-60 (2x2 stratified offsets, min-dimension scaling).
    """
    ss = supersampling
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    frag_x = x.reshape(-1)                       # [P]
    frag_y = (height - y).reshape(-1)
    sy, sx = jnp.meshgrid(
        jnp.arange(ss, dtype=dtype), jnp.arange(ss, dtype=dtype), indexing="ij"
    )
    off_x = (sx.reshape(-1) / ss) - 0.5          # [S]
    off_y = (sy.reshape(-1) / ss) - 0.5
    fx = (frag_x[:, None] + off_x[None, :]).reshape(-1)   # [P*S]
    fy = (frag_y[:, None] + off_y[None, :]).reshape(-1)
    res_min = float(min(width, height))
    nx = (fx * 2.0 - width) / res_min
    ny = (fy * 2.0 - height) / res_min
    return Vec2(nx, ny)
