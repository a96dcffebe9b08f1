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
from .dgather import gather_tables, gather_texels
from typing import NamedTuple


def _bilinear_gamma(
    plane_r, plane_g, plane_b, widths, heights, tid, u, v
) -> Vec3:
    """Bilinear fetch from a padded [A,Hp,Wp] per-channel atlas.

    tid/u/v are per-ray arrays; widths/heights are the *actual* per-image
    dims.  Returns gamma-space values.

    The four taps go through ONE `gather_texels` call (indices stacked
    [4,N]) so the backward pass accumulates all taps' texel adjoints in
    a single sort-based segment sum instead of four N-update scatters
    (ops/dgather.py)."""
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

    def flat(xi, yi):
        # clamp-to-edge + vertical flip (texture.rs:59-63)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yc = jnp.clip(h - yi.astype(jnp.int32) - 1, 0, h - 1)
        return (tid * hp + yc) * wp + xc

    taps = jnp.stack(
        [flat(x1, y1), flat(x2, y1), flat(x1, y2), flat(x2, y2)], axis=0
    )                                                     # [4, N]
    tr, tg, tb = gather_texels(taps, (fr, fg, fb))        # each [4, N]
    wts = jnp.stack(
        [
            (x2 - x) * (y2 - y),
            (x - x1) * (y2 - y),
            (x2 - x) * (y - y1),
            (x - x1) * (y - y1),
        ],
        axis=0,
    )
    return Vec3((tr * wts).sum(0), (tg * wts).sum(0), (tb * wts).sum(0))


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


def point_emission(s: SceneArrays, mat_id, uv: Vec2, textured: bool = True) -> Vec3:
    """Emission channel only — used for NEE shadow-hit radiance.

    `textured=False` is a STATIC (trace-time) promise that no material
    has an emission texture (scene/compile.py texture_channel_flags): the
    atlas fetch is skipped entirely — bit-identical output (the fetch
    would be masked out per-lane anyway) and it prunes the fetch's whole
    uv->bilinear chain from forward and backward programs.  The pruning
    matters most in the VJP: the shadow-hit uv chain's transpose was the
    single dominant cost of the round-2 backward pass (docs/perf.md)."""
    from ..utils.vec import where3

    er, eg, eb = gather_tables(
        mat_id, (s.mat_emission_r, s.mat_emission_g, s.mat_emission_b)
    )
    color = Vec3(er, eg, eb)
    if not textured:
        return color
    tex = s.mat_emission_tex[mat_id]
    val = sample_atlas(s, jnp.maximum(tex, 0), uv.x, uv.y)
    return where3(tex >= 0, val * color, color)


def point_material(
    s: SceneArrays, mat_id, uv: Vec2,
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
) -> PointMaterial:
    """Sample the 3 material channels at the hit uv (scene.rs:345-348).

    All ten float channels are gathered through one `gather_tables` call:
    the backward pass then accumulates every material-scalar gradient in
    a single one-hot matmul instead of ten scatters (ops/dgather.py).

    `tex_channels` = static (albedo, emission, roughness) flags: False
    promises no material textures that channel, skipping its atlas fetch
    (see point_emission; scene/compile.py computes the flags)."""
    from ..utils.vec import where3

    (ar, ag, ab, er, eg, eb, rr, rg, rb, param) = gather_tables(
        mat_id,
        (
            s.mat_albedo_r, s.mat_albedo_g, s.mat_albedo_b,
            s.mat_emission_r, s.mat_emission_g, s.mat_emission_b,
            s.mat_rough_r, s.mat_rough_g, s.mat_rough_b,
            s.mat_param,
        ),
    )

    def chan(base: Vec3, ct, on: bool) -> Vec3:
        if not on:
            return base
        tex = ct[mat_id]
        has = tex >= 0
        val = sample_atlas(s, jnp.maximum(tex, 0), uv.x, uv.y)
        return where3(has, val * base, base)

    alb_on, emi_on, rou_on = tex_channels
    albedo = chan(Vec3(ar, ag, ab), s.mat_albedo_tex, alb_on)
    emission = chan(Vec3(er, eg, eb), s.mat_emission_tex, emi_on)
    rough = chan(Vec3(rr, rg, rb), s.mat_rough_tex, rou_on)
    return PointMaterial(
        surface=s.mat_surface[mat_id],
        param=param,
        albedo=albedo,
        emission=emission,
        roughness=rough.x,
    )
