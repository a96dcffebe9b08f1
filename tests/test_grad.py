"""Differentiability: parameter gradients pass finite-difference checks
(BASELINE.json: pixel-gradient allclose vs finite differences)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanamaru_tpu.diff import params as dp
from hanamaru_tpu.ops import integrator
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    GGX,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)
from hanamaru_tpu.utils.vec import from_stacked

T = TextureDesc


def _scene():
    return SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-20, -1, -20), (20, 0, 20), MaterialDesc(
                DIFFUSE, albedo=T.const(0.6, 0.4, 0.2))),
            SphereDesc((1.0, 0.5, 0.0), 0.5, MaterialDesc(
                GGX, 0.7, albedo=T.const(0.8, 0.2, 0.2), roughness=T.gray(0.3))),
            SphereDesc((0, 2, 0), 0.2, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(15.0))),
        ],
        skybox=SkyboxDesc(),
    )


def _loss_builder():
    cs = compile_scene(_scene())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    params, rest = dp.split(arrays)

    n = 256
    rng = np.random.RandomState(7)
    o = np.tile([[0.0, 2.5, 3.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 1] -= 1.0   # bias downward so most rays hit something
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov, dv = from_stacked(jnp.asarray(o)), from_stacked(jnp.asarray(d))
    key = jax.random.PRNGKey(3)

    def loss(p):
        arr = dp.merge(p, rest)
        rad = integrator.trace(arr, ov, dv, key, 3)
        return (rad.x + rad.y + rad.z).mean()

    return loss, params


@pytest.mark.parametrize(
    "field,index",
    [
        ("mat_albedo_r", 0),      # floor albedo red
        ("mat_emission_g", 2),    # light emission green
        ("mat_rough_r", 1),       # ggx sphere roughness
        ("mat_param", 1),         # ggx f0
        ("sky_intensity", None),  # skybox intensity (black sky -> ~0 grad)
    ],
)
def test_grad_matches_finite_difference(field, index):
    loss, params = _loss_builder()
    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))

    if field == "sky_intensity":
        # black sky: gradient exists and is finite; value is 0
        np.testing.assert_allclose(np.asarray(g[field].x), 0.0, atol=1e-6)
        return

    eps = 3e-3
    base = params[field]
    up = base.at[index].add(eps)
    dn = base.at[index].add(-eps)
    f_up = loss({**params, field: up})
    f_dn = loss({**params, field: dn})
    fd = (f_up - f_dn) / (2 * eps)
    got = np.asarray(g[field])[index]
    np.testing.assert_allclose(got, fd, rtol=0.08, atol=3e-4)


def test_texture_texel_gradients():
    """Gradients flow into individual texels through the bilinear fetch."""
    from hanamaru_tpu import models

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    params, rest = dp.split(arrays)
    n = 128
    rng = np.random.RandomState(1)
    o = np.tile([[0.0, 2.0, 6.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov, dv = from_stacked(jnp.asarray(o)), from_stacked(jnp.asarray(d))

    def loss(p):
        arr = dp.merge(p, rest)
        rad = integrator.trace(arr, ov, dv, jax.random.PRNGKey(0), 2)
        return rad.x.mean()

    g = jax.grad(loss)(params)
    tex_grad = np.asarray(g["tex_r"])
    assert np.all(np.isfinite(tex_grad))
    assert np.abs(tex_grad).sum() > 0, "no gradient reached the texture atlas"
