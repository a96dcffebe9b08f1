"""The five BSDFs as branch-free batched sampling / evaluation.

TPU-native counterpart of the reference's SurfaceType match dispatch
(reference: src/material.rs:91-199): every branch is computed for every
ray on the VPU and the live one is selected by surface-code masks — far
cheaper on a vector machine than divergent control flow, since each branch
is a handful of fused elementwise ops.

Conventions preserved from the reference:
- `reflectance` = bsdf * cos / pdf (material.rs:33-39);
- alpha = roughness, not roughness^2 (material.rs:250-255);
- GGX half-vector importance sampling in the UE4 form (material.rs:260-269);
- height-correlated Smith-joint masking (material.rs:271-280);
- Schlick Fresnel (material.rs:282-284);
- refraction: exact (r_s+r_p)/2 Fresnel russian roulette, nnt^2 radiance
  correction, TIR -> reflect (material.rs:154-199);
- GGX samples below the horizon kill the ray (material.rs:121-124).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OFFSET, PI, PI2
from ..scene import desc as D
from ..utils.scalars import saturate
from ..utils.vec import Vec3, orthonormal_basis, where3


class BsdfSample(NamedTuple):
    origin: Vec3          # next-ray origin (already OFFSET-shifted)
    direction: Vec3
    reflectance: jax.Array
    valid: jax.Array      # False = ray killed (GGX below-horizon sample)


def _g_smith_joint_lambda(x_dot_n, alpha2):
    # floor at 1e-9: the backward pass computes 1/x^4, which must stay
    # finite in f32 (1e-20 would overflow); the clamp only kicks in at
    # grazing angles where the masking term vanishes anyway
    a = 1.0 / jnp.maximum(x_dot_n * x_dot_n, 1e-9) - 1.0
    return 0.5 * jnp.sqrt(1.0 + alpha2 * a) - 0.5


def g_smith_joint(l_dot_n, v_dot_n, alpha2):
    lam_l = _g_smith_joint_lambda(l_dot_n, alpha2)
    lam_v = _g_smith_joint_lambda(v_dot_n, alpha2)
    return 1.0 / (1.0 + lam_l + lam_v)


def f_schlick(v_dot_h, f0):
    m = 1.0 - v_dot_h
    m2 = m * m
    return f0 + (1.0 - f0) * (m2 * m2 * m)


def roughness_to_alpha2(roughness):
    # UE4-parity quirk: alpha = roughness (material.rs:250-255)
    return roughness * roughness


def cosine_sample(u1, u2, n: Vec3) -> Vec3:
    """Cosine-weighted hemisphere direction (material.rs:227-248)."""
    tangent, binormal = orthonormal_basis(n)
    phi = PI2 * u1
    # 1e-12 floors keep sqrt's derivative finite at u2 in {0, 1} so masked
    # lanes never poison the backward pass with inf * 0
    sin_t = jnp.sqrt(jnp.maximum(u2, 1e-12))
    return (
        tangent * (jnp.cos(phi) * sin_t)
        + binormal * (jnp.sin(phi) * sin_t)
        + n * jnp.sqrt(jnp.maximum(1.0 - u2, 1e-12))
    )


def ggx_half_sample(u1, u2, n: Vec3, alpha2) -> Vec3:
    """NDF-importance-sampled half vector (material.rs:260-269)."""
    tangent, binormal = orthonormal_basis(n)
    phi = PI2 * u1
    cos_t = jnp.sqrt(
        jnp.clip((1.0 - u2) / (1.0 + (alpha2 - 1.0) * u2), 1e-12, 1.0)
    )
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    return (
        tangent * (sin_t * jnp.cos(phi))
        + binormal * (sin_t * jnp.sin(phi))
        + n * cos_t
    )


def _refraction_branch(
    u1, position: Vec3, incident: Vec3, normal: Vec3, ior
) -> tuple[Vec3, Vec3, jax.Array]:
    """Fresnel russian-roulette reflect/refract (material.rs:154-199).

    `incident` is the direction of travel (the reference's `ray = -view`)."""
    # all five BSDF branches run for every lane; lanes whose material is not
    # refractive carry param=0, and 1/0 would plant inf -> 0*inf nan here
    ior = jnp.maximum(ior, 1e-3)
    is_incoming = incident.dot(normal) < 0.0
    oriented = where3(is_incoming, normal, -normal)
    nnt = jnp.where(is_incoming, 1.0 / ior, ior)
    reflect_dir = incident.reflect(oriented)
    refract_dir = incident.refract(oriented, nnt)
    tir = (
        (refract_dir.x == 0.0) & (refract_dir.y == 0.0) & (refract_dir.z == 0.0)
    )

    cos_i = incident.dot(-oriented)
    cos_t = refract_dir.dot(-oriented)
    # magnitude clamp (not just ==0): d(1/x) overflows f32 for tiny x and
    # poisons masked lanes with inf*0=nan in the backward pass
    safe = lambda x, eps: jnp.where(jnp.abs(x) < eps, eps, x)
    denom_s = safe(nnt * cos_i + cos_t, 1e-9)
    denom_p = safe(nnt * cos_t + cos_i, 1e-9)
    r_s = ((nnt * cos_i - cos_t) / denom_s) ** 2
    r_p = ((nnt * cos_t - cos_i) / denom_p) ** 2
    fr = 0.5 * (r_s + r_p)

    reflect_rr = u1 <= fr
    take_reflect = tir | reflect_rr
    origin = where3(
        take_reflect,
        position + oriented * OFFSET,
        position - oriented * OFFSET,   # move inside the object
    )
    direction = where3(take_reflect, reflect_dir, refract_dir)
    reflectance = jnp.where(take_reflect, 1.0, nnt * nnt)
    return origin, direction, reflectance


def sample(
    surface, param, roughness, position: Vec3, view: Vec3, normal: Vec3, u1, u2
) -> BsdfSample:
    """Importance-sample the next ray for every surface code, then select.

    view points *away* from the surface (toward the camera path)."""
    incident = -view
    alpha2 = roughness_to_alpha2(roughness)
    offset_origin = position + normal * OFFSET

    # Diffuse (material.rs:95-103)
    diff_dir = cosine_sample(u1, u2, normal)

    # Specular (material.rs:104-111)
    spec_dir = incident.reflect(normal)

    # Refraction (material.rs:113-115)
    refr_o, refr_d, refr_w = _refraction_branch(u1, position, incident, normal, param)

    # GGX (material.rs:116-144)
    half = ggx_half_sample(u1, u2, normal, alpha2)
    ggx_dir = incident.reflect(half)
    l_dot_n = ggx_dir.dot(normal)
    v_dot_n = view.dot(normal)
    v_dot_h = view.dot(half)
    h_dot_n = half.dot(normal)
    g = g_smith_joint(l_dot_n, v_dot_n, alpha2)
    fres = f_schlick(v_dot_h, param)
    denom = h_dot_n * v_dot_n
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    ggx_w = fres * saturate(g * v_dot_h / denom)  # material.rs:135 saturate
    ggx_valid = l_dot_n >= 0.0

    # GGXRefraction (material.rs:145-149): refraction through the GGX half
    ggxr_o, ggxr_d, ggxr_w = _refraction_branch(u1, position, incident, half, param)

    is_diff = surface == D.DIFFUSE
    is_spec = surface == D.SPECULAR
    is_refr = surface == D.REFRACTION
    is_ggx = surface == D.GGX

    origin = where3(
        is_diff | is_spec | is_ggx,
        offset_origin,
        where3(is_refr, refr_o, ggxr_o),
    )
    direction = where3(
        is_diff,
        diff_dir,
        where3(
            is_spec,
            spec_dir,
            where3(is_refr, refr_d, where3(is_ggx, ggx_dir, ggxr_d)),
        ),
    )
    reflectance = jnp.where(
        is_diff | is_spec,
        1.0,
        jnp.where(is_refr, refr_w, jnp.where(is_ggx, ggx_w, ggxr_w)),
    )
    valid = jnp.where(is_ggx, ggx_valid, True)
    return BsdfSample(origin, direction, reflectance, valid)


def evaluate(surface, param, roughness, view: Vec3, normal: Vec3, light: Vec3):
    """BSDF value for NEE directions (material.rs:53-89).

    Only Diffuse (1/pi) and GGX (D*G*F / (4 lN vN)) are NEE-able; all other
    surfaces return 0."""
    alpha2 = roughness_to_alpha2(roughness)
    half = (light + view).normalize()
    l_dot_n = light.dot(normal)
    v_dot_n = view.dot(normal)
    v_dot_h = view.dot(half)
    h_dot_n = half.dot(normal)

    tmp = 1.0 - (1.0 - alpha2) * h_dot_n * h_dot_n
    d_ggx = alpha2 / (PI * jnp.maximum(tmp * tmp, 1e-20))
    g = g_smith_joint(l_dot_n, v_dot_n, alpha2)
    fres = f_schlick(v_dot_h, param)
    denom = 4.0 * l_dot_n * v_dot_n
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    ggx_val = jnp.where(l_dot_n < 0.0, 0.0, d_ggx * g * fres / denom)

    return jnp.where(
        surface == D.DIFFUSE,
        1.0 / PI,
        jnp.where(surface == D.GGX, ggx_val, 0.0),
    )


def nee_available(surface):
    """Diffuse & GGX only (material.rs:42-51)."""
    return (surface == D.DIFFUSE) | (surface == D.GGX)
