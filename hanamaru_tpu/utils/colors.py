"""Color transforms (gamma, HSV, luminance) as pure batched functions.

Counterpart of the reference's color helpers (reference: src/color.rs:10-65).
Colors are `Vec3` batches in linear space unless noted.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import GAMMA_FACTOR
from .vec import Vec3, vec3


def gamma_to_linear(c: Vec3, gamma: float = GAMMA_FACTOR) -> Vec3:
    # reference: color.rs:26-36 (v ** 2.2)
    return Vec3(self_pow(c.x, gamma), self_pow(c.y, gamma), self_pow(c.z, gamma))


def linear_to_gamma(c: Vec3, gamma: float = GAMMA_FACTOR) -> Vec3:
    # reference: color.rs:38-48 (v ** (1/2.2))
    inv = 1.0 / gamma
    return Vec3(self_pow(c.x, inv), self_pow(c.y, inv), self_pow(c.z, inv))


def self_pow(v, e):
    # x ** e with x clamped at 0 so autodiff never sees pow of a negative
    return jnp.power(jnp.maximum(v, 0.0), e)


def luminance(c: Vec3):
    # reference weights (0.22, 0.707, 0.071) (color.rs:63-65)
    return 0.22 * c.x + 0.707 * c.y + 0.071 * c.z


def _hue(h):
    r = jnp.clip(jnp.abs(h * 6.0 - 3.0) - 1.0, 0.0, 1.0)
    g = jnp.clip(2.0 - jnp.abs(h * 6.0 - 2.0), 0.0, 1.0)
    b = jnp.clip(2.0 - jnp.abs(h * 6.0 - 4.0), 0.0, 1.0)
    return Vec3(r, g, b)


def hsv_to_rgb(c: Vec3) -> Vec3:
    # reference: color.rs:51-61 — ((hue(h) - 1) * s + 1) * v
    h = _hue(c.x)
    return ((h - 1.0) * c.y + 1.0) * c.z


def hsv(h: float, s: float, v: float) -> Vec3:
    """Host-side convenience used by scene builders."""
    return hsv_to_rgb(vec3(h, s, v))
