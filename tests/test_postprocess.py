import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.config import RenderConfig
from hanamaru_tpu.ops.postprocess import bilateral, finalize_image, tonemap_reinhard
from hanamaru_tpu.utils.colors import gamma_to_linear, linear_to_gamma
from hanamaru_tpu.utils.vec import Vec3, vec3


def test_gamma_roundtrip():
    c = vec3(jnp.asarray([0.0, 0.2, 1.0]), jnp.asarray([0.5, 0.7, 0.9]), jnp.asarray([0.1, 0.4, 0.8]))
    rt = gamma_to_linear(linear_to_gamma(c))
    np.testing.assert_allclose(rt.stack(), c.stack(), atol=1e-6)


def test_reinhard_matches_reference_formula():
    # tonemap.rs:22-27 with exposure 1.5, white point 20
    c = vec3(jnp.asarray([2.0]), jnp.asarray([1.0]), jnp.asarray([0.5]))
    out = tonemap_reinhard(c, 1.5, 20.0)
    e = np.array([2.0, 1.0, 0.5]) * 1.5
    lum = 0.22 * e[0] + 0.707 * e[1] + 0.071 * e[2]
    wp = 20.0 * 1.5
    expect = np.clip(e * (lum / (wp * wp) + 1.0) / (lum + 1.0), 0, 1)
    np.testing.assert_allclose(np.asarray(out.stack()).ravel(), expect, rtol=1e-6)


def test_reinhard_saturates():
    c = vec3(jnp.asarray([1e4]), jnp.asarray([1e4]), jnp.asarray([1e4]))
    out = tonemap_reinhard(c, 1.5, 20.0)
    assert float(jnp.max(out.max_component())) <= 1.0


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
    return Vec3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]))


def test_bilateral_preserves_constant_image():
    cfg = RenderConfig()
    c = Vec3(jnp.full((8, 8), 0.25), jnp.full((8, 8), 0.5), jnp.full((8, 8), 0.75))
    out = bilateral(c, cfg)
    np.testing.assert_allclose(out.stack(), c.stack(), rtol=1e-5)


def test_bilateral_smooths_noise():
    cfg = RenderConfig()
    img = _img(16, 16)
    out = bilateral(img, cfg)
    assert float(jnp.var(out.x)) < float(jnp.var(img.x))
    # weights normalize: mean roughly preserved
    np.testing.assert_allclose(float(out.x.mean()), float(img.x.mean()), atol=0.05)


def test_bilateral_edge_bug_mode_differs_at_edges_only():
    cfg_ok = RenderConfig()
    cfg_bug = RenderConfig(bilateral_reference_edge_bug=True)
    img = _img(12, 12, seed=3)
    a = np.asarray(bilateral(img, cfg_ok).stack())
    b = np.asarray(bilateral(img, cfg_bug).stack())
    # interior identical
    np.testing.assert_allclose(a[1:-1, 1:-1], b[1:-1, 1:-1], atol=1e-7)
    # edges differ (u32-underflow parity pulls opposite-edge neighbors)
    assert np.abs(a - b)[[0, -1], :].max() > 0


def test_finalize_image_pipeline():
    cfg = RenderConfig(bilateral_iterations=1)
    acc = _img(6, 6) * 8.0   # pretend 2 passes of 4 rays each
    img = finalize_image(acc, 2, cfg)
    assert img.shape == (6, 6, 3)
    assert img.dtype == jnp.uint8
