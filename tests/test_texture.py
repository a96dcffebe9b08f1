"""Texture atlas + skybox sampling semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.config import GAMMA_FACTOR
from hanamaru_tpu.ops.texture import point_material, sample_atlas, sample_skybox
from hanamaru_tpu.scene.compile import SceneArrays, compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    CameraDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)
from hanamaru_tpu.utils.vec import Vec2, Vec3, from_stacked


def _scene_with_atlas(tmp_path):
    """Scene whose floor sphere has a tiny generated PNG albedo."""
    from PIL import Image

    # 2x2 texture: distinct corner colors (values in gamma space)
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    p = tmp_path / "t.png"
    Image.fromarray(px, "RGB").save(p)
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 5), target=(0, 0, 0)),
        elements=[
            SphereDesc(
                (0.0, 0.0, 0.0), 1.0,
                MaterialDesc(DIFFUSE, albedo=TextureDesc.image(str(p), (0.5, 1.0, 1.0))),
            )
        ],
        skybox=SkyboxDesc(),
    )
    return compile_scene(scene, asset_root=str(tmp_path))


def test_bilinear_center_matches_reference_math(tmp_path):
    cs = _scene_with_atlas(tmp_path)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    # u=v=0.5 on a 2x2 image: x=y=1.0 -> taps (1,1),(2,1),(1,2),(2,2)
    # clamped; with the y-flip, rows flip. Reference blends in gamma space
    # then decodes (texture.rs:42-48).
    tid = jnp.asarray([0])
    out = sample_atlas(s, tid, jnp.asarray([0.5]), jnp.asarray([0.5]))
    # taps: x in {1, 2->1}, y in {1, 2->1} flipped -> row0 = [255,0,0],[0,255,0]
    # all four taps at (1,1): screen x=1,y clamp: H-1-1=0 -> pixel (0,1)=green
    g = np.asarray(out.stack()).ravel()
    expect = ((np.array([0, 255, 0]) / 255.0) ** GAMMA_FACTOR) * np.array([1, 1, 1])
    np.testing.assert_allclose(g, expect, atol=1e-5)


def test_point_material_tint_and_const(tmp_path):
    cs = _scene_with_atlas(tmp_path)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    pm = point_material(s, jnp.asarray([0]), Vec2(jnp.asarray([0.5]), jnp.asarray([0.5])))
    # tint (0.5,1,1) multiplies the sampled green
    np.testing.assert_allclose(float(pm.albedo.y[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(pm.albedo.x[0]), 0.0, atol=1e-5)
    # emission channel is constant black
    np.testing.assert_allclose(float(pm.emission.x[0]), 0.0)
    assert int(pm.surface[0]) == DIFFUSE


def _skybox_scene():
    from hanamaru_tpu import models

    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 5), target=(0, 0, 0)),
        elements=[SphereDesc((0, 0, 0), 0.1, MaterialDesc(DIFFUSE))],
        skybox=SkyboxDesc(
            px="textures/cube/Powerlines/posx.jpg",
            nx="textures/cube/Powerlines/negx.jpg",
            py="textures/cube/Powerlines/posy.jpg",
            ny="textures/cube/Powerlines/negy.jpg",
            pz="textures/cube/Powerlines/posz.jpg",
            nz="textures/cube/Powerlines/negz.jpg",
            intensity=(2.0, 1.0, 1.0),
        ),
    )
    return compile_scene(scene, models.asset_root())


def test_skybox_face_selection_and_intensity():
    cs = _skybox_scene()
    s = jax.tree.map(jnp.asarray, cs.arrays)
    dirs = from_stacked(
        jnp.asarray(
            [
                [1.0, 0.01, 0.02],
                [-1.0, 0.01, 0.02],
                [0.0, 1.0, 0.0],
                [0.0, -1.0, 0.0],
                [0.01, 0.0, 1.0],
                [0.01, 0.0, -1.0],
            ],
            jnp.float32,
        )
    )
    out = sample_skybox(s, dirs)
    v = np.asarray(out.stack())
    assert np.all(np.isfinite(v)) and np.all(v >= 0)
    # faces differ (real photos)
    assert len(np.unique(v.round(4), axis=0)) == 6

    # intensity multiplier scales channel-wise
    cs1 = _skybox_scene()
    arr1 = cs1.arrays._replace(sky_intensity=Vec3(np.float32(1.0), np.float32(1.0), np.float32(1.0)))
    s1 = jax.tree.map(jnp.asarray, arr1)
    out1 = sample_skybox(s1, dirs)
    np.testing.assert_allclose(np.asarray(out.x), 2.0 * np.asarray(out1.x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(out1.y), rtol=1e-5)


def test_skybox_matches_host_reference_sampler():
    """Cross-check one direction against a straight numpy port of
    Skybox::sample + sample_bilinear (scene.rs:295-319, texture.rs:29-63)."""
    cs = _skybox_scene()
    s = jax.tree.map(jnp.asarray, cs.arrays)
    d = np.array([0.3, 0.2, -0.9])
    d = d / np.linalg.norm(d)
    out = sample_skybox(s, from_stacked(jnp.asarray(d[None], jnp.float32)))

    # host reference: nz face, u = x/z, v = -y/z
    face = 5
    u = d[0] / d[2]
    v = -d[1] / d[2]
    u, v = 0.5 * (u + 1.0), 0.5 * (v + 1.0)
    plane = np.stack(
        [np.asarray(cs.arrays.sky_r[face]), np.asarray(cs.arrays.sky_g[face]), np.asarray(cs.arrays.sky_b[face])],
        axis=-1,
    )
    h = int(cs.arrays.sky_h[face])
    w = int(cs.arrays.sky_w[face])
    x, y = u * w, v * h
    x1, y1 = np.floor(x), np.floor(y)
    x2, y2 = x1 + 1, y1 + 1

    def fetch(xi, yi):
        xc = int(np.clip(xi, 0, w - 1))
        yc = int(np.clip(h - yi - 1, 0, h - 1))
        return plane[yc, xc]

    gamma = (
        fetch(x1, y1) * (x2 - x) * (y2 - y)
        + fetch(x2, y1) * (x - x1) * (y2 - y)
        + fetch(x1, y2) * (x2 - x) * (y - y1)
        + fetch(x2, y2) * (x - x1) * (y - y1)
    )
    expect = (gamma ** GAMMA_FACTOR) * np.array([2.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out.stack()).ravel(), expect, rtol=1e-4, atol=1e-5)
