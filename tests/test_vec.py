import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.utils.vec import (
    Vec3,
    det3,
    from_stacked,
    orthonormal_basis,
    vec3,
    where3,
)


def _rand_vec3(rng, n=64):
    return from_stacked(jnp.asarray(rng.standard_normal((n, 3))))


def test_arithmetic_and_dot(rng):
    a = _rand_vec3(rng)
    b = _rand_vec3(rng)
    an, bn = np.asarray(a.stack()), np.asarray(b.stack())
    np.testing.assert_allclose((a + b).stack(), an + bn, rtol=1e-6)
    np.testing.assert_allclose((a - b).stack(), an - bn, rtol=1e-6)
    np.testing.assert_allclose((a * 2.0).stack(), an * 2.0, rtol=1e-6)
    np.testing.assert_allclose(a.dot(b), (an * bn).sum(-1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(a.cross(b).stack(), np.cross(an, bn), rtol=1e-5, atol=1e-5)


def test_normalize_length(rng):
    a = _rand_vec3(rng)
    n = a.normalize()
    np.testing.assert_allclose(n.length(), 1.0, atol=1e-5)


def test_reflect_matches_reference_formula():
    # v - 2 dot(v,n) n (vector.rs:60-62): 45-degree mirror
    v = vec3(1.0, -1.0, 0.0)
    n = vec3(0.0, 1.0, 0.0)
    r = v.reflect(n)
    np.testing.assert_allclose(r.stack(), [1.0, 1.0, 0.0], atol=1e-7)


def test_refract_snell_and_tir():
    n = vec3(0.0, 1.0, 0.0)
    # normal incidence passes straight through
    v = vec3(0.0, -1.0, 0.0)
    r = v.refract(n, 1.0 / 1.5)
    np.testing.assert_allclose(r.stack(), [0.0, -1.0, 0.0], atol=1e-6)
    # beyond the critical angle from inside glass -> zero vector
    # (vector.rs:64-71)
    grazing = vec3(np.sin(np.radians(80.0)), -np.cos(np.radians(80.0)), 0.0)
    r = grazing.refract(n, 1.5)
    np.testing.assert_allclose(r.stack(), [0.0, 0.0, 0.0], atol=1e-7)


def test_det3_vs_numpy(rng):
    a = _rand_vec3(rng, 16)
    b = _rand_vec3(rng, 16)
    c = _rand_vec3(rng, 16)
    m = np.stack([np.asarray(a.stack()), np.asarray(b.stack()), np.asarray(c.stack())], axis=-1)
    np.testing.assert_allclose(det3(a, b, c), np.linalg.det(m), rtol=1e-4, atol=1e-5)


def test_orthonormal_basis(rng):
    n = _rand_vec3(rng).normalize()
    t, b = orthonormal_basis(n)
    np.testing.assert_allclose(t.dot(n), 0.0, atol=1e-5)
    np.testing.assert_allclose(b.dot(n), 0.0, atol=1e-5)
    np.testing.assert_allclose(t.dot(b), 0.0, atol=1e-5)
    np.testing.assert_allclose(t.length(), 1.0, atol=1e-5)
    np.testing.assert_allclose(b.length(), 1.0, atol=1e-5)
    # right-handedness: t x b == n
    np.testing.assert_allclose(t.cross(b).stack(), n.stack(), atol=1e-5)


def test_where3():
    a = vec3(jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0]), jnp.asarray([5.0, 6.0]))
    b = a * 10.0
    out = where3(jnp.asarray([True, False]), a, b)
    np.testing.assert_allclose(out.x, [1.0, 20.0])
