"""Batched 3D/2D vector math as structure-of-arrays.

TPU-native replacement for the reference's scalar Vector3/Vector2
(reference: src/vector.rs:8-410).  A `Vec3` is a pytree of three arrays of
identical shape; on TPU this keeps the 128-wide lane dimension full of rays
instead of wasting a tile on xyz components, and lets XLA fuse the whole
shading chain into a few VPU loops.

All functions are shape-polymorphic: components may be scalars or any
broadcast-compatible arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Vec3(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)
        return Vec3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)
        return Vec3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return Vec3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)
        return Vec3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec3):
            return Vec3(self.x / o.x, self.y / o.y, self.z / o.z)
        return Vec3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    # -- geometry -----------------------------------------------------------
    def dot(self, o: "Vec3") -> jax.Array:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self) -> jax.Array:
        return self.dot(self)

    def length(self) -> jax.Array:
        return jnp.sqrt(self.dot(self))

    def normalize(self) -> "Vec3":
        # the tiny floor keeps rsqrt finite for degenerate vectors so
        # reverse-mode cotangents through masked-out lanes never see inf
        return self * jax.lax.rsqrt(jnp.maximum(self.dot(self), 1e-20))

    def reflect(self, n: "Vec3") -> "Vec3":
        # reference semantics: v - 2*dot(v,n)*n (vector.rs:60-62)
        return self - n * (2.0 * self.dot(n))

    def refract(self, n: "Vec3", eta) -> "Vec3":
        """Snell refraction; zero vector on total internal reflection
        (reference: vector.rs:64-71)."""
        cos_i = self.dot(n)
        k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
        tir = k < 0.0
        k_safe = jnp.maximum(k, 1e-12)
        out = self * eta - n * (eta * cos_i + jnp.sqrt(k_safe))
        return where3(tir, zeros3_like(self.x), out)

    def saturate(self) -> "Vec3":
        return Vec3(
            jnp.clip(self.x, 0.0, 1.0),
            jnp.clip(self.y, 0.0, 1.0),
            jnp.clip(self.z, 0.0, 1.0),
        )

    def max_component(self) -> jax.Array:
        return jnp.maximum(self.x, jnp.maximum(self.y, self.z))

    def sum(self) -> jax.Array:
        return self.x + self.y + self.z

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))

    def stack(self, axis: int = -1) -> jax.Array:
        """Materialize as a dense [..., 3] array (host I/O only)."""
        return jnp.stack([self.x, self.y, self.z], axis=axis)


# -- constructors -----------------------------------------------------------
def vec3(x, y, z) -> Vec3:
    return Vec3(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def splat3(v) -> Vec3:
    a = jnp.asarray(v)
    return Vec3(a, a, a)


def zeros3_like(ref) -> Vec3:
    z = jnp.zeros_like(ref)
    return Vec3(z, z, z)


def full3_like(ref, x, y, z) -> Vec3:
    return Vec3(
        jnp.full_like(ref, x), jnp.full_like(ref, y), jnp.full_like(ref, z)
    )


def from_stacked(a) -> Vec3:
    """[..., 3] array -> Vec3 (host-side scene compile only)."""
    a = jnp.asarray(a)
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


# -- select / gather --------------------------------------------------------
def where3(cond, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.where(cond, a.x, b.x),
        jnp.where(cond, a.y, b.y),
        jnp.where(cond, a.z, b.z),
    )


def gather3(v: Vec3, idx) -> Vec3:
    """Index a table Vec3 by an integer array."""
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


def min3(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.minimum(a.x, b.x), jnp.minimum(a.y, b.y), jnp.minimum(a.z, b.z))


def max3(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(jnp.maximum(a.x, b.x), jnp.maximum(a.y, b.y), jnp.maximum(a.z, b.z))


def mix3(a: Vec3, b: Vec3, t) -> Vec3:
    return a + (b - a) * t


def det3(a: Vec3, b: Vec3, c: Vec3) -> jax.Array:
    """3x3 determinant with columns a,b,c (reference: src/math.rs:25-32);
    used by the Möller-Trumbore-style triangle test."""
    return (
        a.x * b.y * c.z
        + a.y * b.z * c.x
        + a.z * b.x * c.y
        - a.x * b.z * c.y
        - a.y * b.x * c.z
        - a.z * b.y * c.x
    )


def orthonormal_basis(n: Vec3) -> tuple[Vec3, Vec3]:
    """Gram-Schmidt tangent basis matching the reference's branch on |n.x|
    (reference: src/material.rs:202-211): up = +Y when |n.x| > EPS else +X."""
    use_y = jnp.abs(n.x) > 1e-4
    up = where3(
        use_y,
        full3_like(n.x, 0.0, 1.0, 0.0),
        full3_like(n.x, 1.0, 0.0, 0.0),
    )
    tangent = up.cross(n).normalize()
    binormal = n.cross(tangent)
    return tangent, binormal


class Vec2(NamedTuple):
    x: jax.Array
    y: jax.Array

    def __add__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x + o.x, self.y + o.y)
        return Vec2(self.x + o, self.y + o)

    def __sub__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x - o.x, self.y - o.y)
        return Vec2(self.x - o, self.y - o)

    def __mul__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x * o.x, self.y * o.y)
        return Vec2(self.x * o, self.y * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, Vec2):
            return Vec2(self.x / o.x, self.y / o.y)
        return Vec2(self.x / o, self.y / o)

    def length(self) -> jax.Array:
        return jnp.sqrt(self.x * self.x + self.y * self.y)


def vec2(x, y) -> Vec2:
    return Vec2(jnp.asarray(x), jnp.asarray(y))


def where2(cond, a: Vec2, b: Vec2) -> Vec2:
    return Vec2(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y))
