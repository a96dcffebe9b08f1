"""BSDF sampling/eval sanity: distributions, energy, reference quirks."""
import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.config import OFFSET, PI
from hanamaru_tpu.ops import bsdf
from hanamaru_tpu.scene import desc as D
from hanamaru_tpu.utils.vec import Vec3, full3_like, vec3


def _batch(n, x, y, z):
    o = jnp.ones((n,), jnp.float32)
    return Vec3(o * x, o * y, o * z)


def _uniforms(key, n):
    k1, k2 = jax.random.split(key)
    return (
        jax.random.uniform(k1, (n,), jnp.float32),
        jax.random.uniform(k2, (n,), jnp.float32),
    )


def test_cosine_sample_distribution():
    n = 20000
    u1, u2 = _uniforms(jax.random.PRNGKey(0), n)
    normal = _batch(n, 0.0, 1.0, 0.0)
    d = bsdf.cosine_sample(u1, u2, normal)
    cos = np.asarray(d.dot(normal))
    assert np.all(cos >= -1e-6)
    # E[cos theta] for pdf cos/pi is 2/3
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)


def test_ggx_half_distribution_tightens_with_roughness():
    n = 20000
    u1, u2 = _uniforms(jax.random.PRNGKey(1), n)
    normal = _batch(n, 0.0, 1.0, 0.0)
    smooth = bsdf.ggx_half_sample(u1, u2, normal, bsdf.roughness_to_alpha2(0.05))
    rough = bsdf.ggx_half_sample(u1, u2, normal, bsdf.roughness_to_alpha2(0.8))
    assert float(smooth.dot(normal).mean()) > float(rough.dot(normal).mean())
    assert float(smooth.dot(normal).mean()) > 0.99


def test_diffuse_sample_reflectance_one():
    n = 64
    u1, u2 = _uniforms(jax.random.PRNGKey(2), n)
    normal = _batch(n, 0.0, 1.0, 0.0)
    pos = _batch(n, 0.0, 0.0, 0.0)
    view = _batch(n, 0.0, 1.0, 0.0)
    s = bsdf.sample(
        jnp.zeros((n,), jnp.int32) + D.DIFFUSE,
        jnp.zeros((n,)), jnp.zeros((n,)) + 0.5, pos, view, normal, u1, u2,
    )
    np.testing.assert_allclose(s.reflectance, 1.0)
    assert np.all(np.asarray(s.valid))
    # origin offset along the normal (material.rs:98)
    np.testing.assert_allclose(s.origin.y, OFFSET, rtol=1e-4)


def test_specular_mirror():
    n = 4
    normal = _batch(n, 0.0, 1.0, 0.0)
    pos = _batch(n, 0.0, 0.0, 0.0)
    view = Vec3(*[jnp.asarray([0.70710678] * n), jnp.asarray([0.70710678] * n), jnp.zeros((n,))])
    u1, u2 = _uniforms(jax.random.PRNGKey(3), n)
    s = bsdf.sample(
        jnp.zeros((n,), jnp.int32) + D.SPECULAR,
        jnp.zeros((n,)), jnp.zeros((n,)), pos, view, normal, u1, u2,
    )
    d = np.asarray(s.direction.stack())
    np.testing.assert_allclose(d[:, 0], -0.70710678, atol=1e-6)
    np.testing.assert_allclose(d[:, 1], 0.70710678, atol=1e-6)


def test_refraction_normal_incidence_energy():
    """At normal incidence on glass, Fresnel reflectance is
    ((n-1)/(n+1))^2 ~ 4%: the sample RR picks reflect for u1 <= 0.04."""
    n = 10000
    u1 = jnp.linspace(0.0, 1.0, n)
    u2 = jnp.zeros((n,))
    normal = _batch(n, 0.0, 1.0, 0.0)
    pos = _batch(n, 0.0, 0.0, 0.0)
    view = _batch(n, 0.0, 1.0, 0.0)   # looking straight down the normal
    s = bsdf.sample(
        jnp.zeros((n,), jnp.int32) + D.REFRACTION,
        jnp.zeros((n,)) + 1.5, jnp.zeros((n,)), pos, view, normal, u1, u2,
    )
    reflected = np.asarray(s.direction.y) > 0
    frac = reflected.mean()
    np.testing.assert_allclose(frac, ((1.5 - 1) / (1.5 + 1)) ** 2, atol=0.005)
    # refracted rays carry the nnt^2 radiance correction (material.rs:195)
    refr_w = np.asarray(s.reflectance)[~reflected]
    np.testing.assert_allclose(refr_w, (1 / 1.5) ** 2, rtol=1e-5)
    # refracted origin moved into the object (material.rs:192)
    assert np.all(np.asarray(s.origin.y)[~reflected] < 0)


def test_ggx_below_horizon_killed():
    n = 10000
    u1, u2 = _uniforms(jax.random.PRNGKey(4), n)
    normal = _batch(n, 0.0, 1.0, 0.0)
    pos = _batch(n, 0.0, 0.0, 0.0)
    # grazing view + high roughness: some half-vectors reflect below horizon
    view = _batch(n, 0.9950372, 0.0995037, 0.0)
    s = bsdf.sample(
        jnp.zeros((n,), jnp.int32) + D.GGX,
        jnp.zeros((n,)) + 0.8, jnp.zeros((n,)) + 0.9, pos, view, normal, u1, u2,
    )
    valid = np.asarray(s.valid)
    assert 0 < valid.sum() < n   # both populations exist
    up = np.asarray(s.direction.dot(normal))
    assert np.all(up[valid] >= 0.0)
    # weights are clamped into [0, 1] by the saturate (material.rs:141)
    w = np.asarray(s.reflectance)[valid]
    assert np.all((w >= 0) & (w <= 1.0))


def test_eval_diffuse_and_ggx():
    n = 8
    normal = _batch(n, 0.0, 1.0, 0.0)
    view = _batch(n, 0.0, 1.0, 0.0)
    light = _batch(n, 0.0, 1.0, 0.0)
    f_diff = bsdf.evaluate(
        jnp.zeros((n,), jnp.int32) + D.DIFFUSE, jnp.zeros((n,)), jnp.zeros((n,)) + 0.5,
        view, normal, light,
    )
    np.testing.assert_allclose(f_diff, 1.0 / PI, rtol=1e-6)
    # below-horizon light direction -> 0 for GGX (material.rs:66-69)
    light_dn = _batch(n, 0.0, -1.0, 0.0)
    f_ggx = bsdf.evaluate(
        jnp.zeros((n,), jnp.int32) + D.GGX, jnp.zeros((n,)) + 0.8,
        jnp.zeros((n,)) + 0.3, view, normal, light_dn,
    )
    np.testing.assert_allclose(f_ggx, 0.0)
    # specular/refraction are not NEE-able -> evaluate to 0
    for st in (D.SPECULAR, D.REFRACTION, D.GGX_REFRACTION):
        f = bsdf.evaluate(
            jnp.zeros((n,), jnp.int32) + st, jnp.zeros((n,)), jnp.zeros((n,)) + 0.5,
            view, normal, light,
        )
        np.testing.assert_allclose(f, 0.0)


def test_ggx_white_furnace_bound():
    """GGX with f0=1: sampled weight <= 1 everywhere and averages close to
    the single-scatter albedo (energy loss only from masking)."""
    n = 50000
    u1, u2 = _uniforms(jax.random.PRNGKey(5), n)
    normal = _batch(n, 0.0, 1.0, 0.0)
    pos = _batch(n, 0.0, 0.0, 0.0)
    view = _batch(n, 0.0, 1.0, 0.0)
    s = bsdf.sample(
        jnp.zeros((n,), jnp.int32) + D.GGX,
        jnp.ones((n,)), jnp.zeros((n,)) + 0.3, pos, view, normal, u1, u2,
    )
    w = np.asarray(jnp.where(s.valid, s.reflectance, 0.0))
    assert w.max() <= 1.0 + 1e-6
    assert 0.8 < w.mean() <= 1.0
