"""Scalar math helpers (reference: src/math.rs:4-36).

Thin wrappers kept for API parity and host-side use; device code mostly
inlines these through jnp.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import EPS


def modulo(a, b):
    """Always-positive modulo (math.rs:4-7)."""
    r = jnp.mod(a, b)
    return jnp.where(r < 0, r + b, r)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def equals_eps(a, b, eps: float = EPS):
    """Epsilon equality (math.rs:21-23; cuboid face id)."""
    return jnp.abs(a - b) < eps


def mix(a, b, t):
    """Linear interpolation (math.rs:34-36)."""
    return a + (b - a) * t
