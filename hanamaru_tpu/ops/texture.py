"""Texture and cube-map sampling as batched gathers.

Bilinear semantics match the reference (reference: src/texture.rs:22-63):
taps at floor(x)/floor(x)+1 with clamp-to-edge and a vertical flip, the
blend happens in *gamma* space and the result is decoded to linear
afterwards (texture.rs:42-48).  Cube-map face selection and per-face uv
ratios follow scene.rs:295-319.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GAMMA_FACTOR
from ..scene.compile import SceneArrays
from ..utils.vec import Vec2, Vec3
from ..utils.colors import gamma_to_linear
from typing import NamedTuple


def _bilinear_gamma(
    plane_r, plane_g, plane_b, widths, heights, tid, u, v
) -> Vec3:
    """Bilinear fetch from a padded [A,Hp,Wp] per-channel atlas.

    tid/u/v are per-ray arrays; widths/heights are the *actual* per-image
    dims.  Returns gamma-space values."""
    _, hp, wp = plane_r.shape
    fr = plane_r.reshape(-1)
    fg = plane_g.reshape(-1)
    fb = plane_b.reshape(-1)

    w = widths[tid]
    h = heights[tid]
    x = u * w.astype(u.dtype)
    y = v * h.astype(v.dtype)
    x1 = jnp.floor(x)
    y1 = jnp.floor(y)
    x2 = x1 + 1.0
    y2 = y1 + 1.0

    def fetch(xi, yi) -> Vec3:
        # clamp-to-edge + vertical flip (texture.rs:59-63)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(h - yi.astype(jnp.int32) - 1, 0, h - 1)
        flat = (tid * hp + yc) * wp + xc
        return Vec3(fr[flat], fg[flat], fb[flat])

    p11 = fetch(x1, y1)
    p12 = fetch(x1, y2)
    p21 = fetch(x2, y1)
    p22 = fetch(x2, y2)
    return (
        p11 * ((x2 - x) * (y2 - y))
        + p21 * ((x - x1) * (y2 - y))
        + p12 * ((x2 - x) * (y - y1))
        + p22 * ((x - x1) * (y - y1))
    )


def sample_atlas(s: SceneArrays, tid, u, v) -> Vec3:
    """Linear-space bilinear sample of atlas texture `tid` at (u, v)."""
    gamma = _bilinear_gamma(s.tex_r, s.tex_g, s.tex_b, s.tex_w, s.tex_h, tid, u, v)
    return gamma_to_linear(gamma)


def sample_skybox(s: SceneArrays, d: Vec3) -> Vec3:
    """Cube-map IBL lookup for direction d (scene.rs:295-319)."""
    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    x_face = (ax > ay) & (ax > az)
    y_face = (ay > ax) & (ay > az)

    px = d.x >= 0.0
    py = d.y >= 0.0
    pz = d.z >= 0.0

    # per-face (u,v) in [-1,1] from direction ratios
    ux = -d.z / d.x
    vx = jnp.where(px, d.y / d.x, -d.y / d.x)
    uy = jnp.where(py, d.x / d.y, -d.x / d.y)
    vy = -d.z / d.y
    uz = d.x / d.z
    vz = jnp.where(pz, d.y / d.z, -d.y / d.z)

    face = jnp.where(
        x_face,
        jnp.where(px, 0, 1),
        jnp.where(y_face, jnp.where(py, 2, 3), jnp.where(pz, 4, 5)),
    ).astype(jnp.int32)
    u = jnp.where(x_face, ux, jnp.where(y_face, uy, uz))
    v = jnp.where(x_face, vx, jnp.where(y_face, vy, vz))

    # sample_bilinear_0center maps [-1,1]^2 -> [0,1]^2 (texture.rs:22-26)
    u01 = 0.5 * (u + 1.0)
    v01 = 0.5 * (v + 1.0)
    gamma = _bilinear_gamma(s.sky_r, s.sky_g, s.sky_b, s.sky_w, s.sky_h, face, u01, v01)
    return gamma_to_linear(gamma) * s.sky_intensity


class PointMaterial(NamedTuple):
    """Per-ray post-texture material snapshot (reference: material.rs:25-31)."""

    surface: jax.Array     # [N] i32 surface code
    param: jax.Array       # [N] f0 / ior
    albedo: Vec3
    emission: Vec3
    roughness: jax.Array   # [N] (x channel of the roughness texture,
                           #  scene.rs:348)


def point_emission(s: SceneArrays, mat_id, uv: Vec2) -> Vec3:
    """Emission channel only — used for NEE shadow-hit radiance."""
    from ..utils.vec import where3

    color = Vec3(
        s.mat_emission_r[mat_id], s.mat_emission_g[mat_id], s.mat_emission_b[mat_id]
    )
    tex = s.mat_emission_tex[mat_id]
    val = sample_atlas(s, jnp.maximum(tex, 0), uv.x, uv.y)
    return where3(tex >= 0, val * color, color)


def point_material(s: SceneArrays, mat_id, uv: Vec2) -> PointMaterial:
    """Sample the 3 material channels at the hit uv (scene.rs:345-348)."""

    def chan(cr, cg, cb, ct) -> Vec3:
        color = Vec3(cr[mat_id], cg[mat_id], cb[mat_id])
        tex = ct[mat_id]
        has = tex >= 0
        val = sample_atlas(s, jnp.maximum(tex, 0), uv.x, uv.y)
        from ..utils.vec import where3

        return where3(has, val * color, color)

    albedo = chan(s.mat_albedo_r, s.mat_albedo_g, s.mat_albedo_b, s.mat_albedo_tex)
    emission = chan(
        s.mat_emission_r, s.mat_emission_g, s.mat_emission_b, s.mat_emission_tex
    )
    rough = chan(s.mat_rough_r, s.mat_rough_g, s.mat_rough_b, s.mat_rough_tex)
    return PointMaterial(
        surface=s.mat_surface[mat_id],
        param=s.mat_param[mat_id],
        albedo=albedo,
        emission=emission,
        roughness=rough.x,
    )
