"""Primitive intersection semantics vs closed-form expectations."""
import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.config import INF
from hanamaru_tpu.ops.intersect import (
    KIND_CUBOID,
    KIND_SPHERE,
    _slab_t,
    _sphere_t,
    _triangle_t,
    intersect_scene,
    surface_attributes,
)
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
)
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.utils.vec import from_stacked, vec3


def _v(x, y, z):
    return vec3(jnp.asarray([x]), jnp.asarray([y]), jnp.asarray([z]))


def test_sphere_closed_form():
    # unit sphere at origin, ray from z=5 toward -z: hit at t=4
    t = _sphere_t(_v(0, 0, 0), 1.0, _v(0, 0, 5), _v(0, 0, -1))
    np.testing.assert_allclose(t, [4.0], rtol=1e-6)


def test_sphere_inside_never_hits():
    # reference parity: only the near root is taken (scene.rs:58-78), so a
    # ray starting inside the sphere misses it
    t = _sphere_t(_v(0, 0, 0), 1.0, _v(0, 0, 0), _v(0, 0, -1))
    assert float(t[0]) >= INF * 0.99


def test_sphere_behind_misses():
    t = _sphere_t(_v(0, 0, 0), 1.0, _v(0, 0, 5), _v(0, 0, 1))
    assert float(t[0]) >= INF * 0.99


def test_slab_inside_gives_exit():
    # from inside an AABB the distance is tmax (bvh.rs:37)
    mn, mx = _v(-1, -1, -1), _v(1, 1, 1)
    inv = _v(1.0, 1e12, 1e12)   # direction +x
    hit, t = _slab_t(mn, mx, _v(0, 0, 0), inv)
    assert bool(hit[0])
    np.testing.assert_allclose(t, [1.0], rtol=1e-5)


def test_triangle_double_sided():
    v0, e1, e2 = _v(-1, -1, 0), _v(2, 0, 0), _v(0, 2, 0)
    t_front, u, v = _triangle_t(v0, e1, e2, _v(-0.5, -0.5, 3), _v(0, 0, -1))
    t_back, _, _ = _triangle_t(v0, e1, e2, _v(-0.5, -0.5, -3), _v(0, 0, 1))
    np.testing.assert_allclose(t_front, [3.0], rtol=1e-6)
    np.testing.assert_allclose(t_back, [3.0], rtol=1e-6)
    np.testing.assert_allclose(u, [0.25], atol=1e-6)
    np.testing.assert_allclose(v, [0.25], atol=1e-6)


def _one_box_scene():
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-2.0, -1.0, -2.0), (2.0, 0.0, 2.0), MaterialDesc(DIFFUSE)),
            SphereDesc((0.0, 1.0, 0.0), 0.5, MaterialDesc(DIFFUSE)),
        ],
        skybox=SkyboxDesc(),
    )
    return compile_scene(scene)


def test_scene_intersect_and_attributes():
    cs = _one_box_scene()
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    o = from_stacked(jnp.asarray([[0.0, 3.0, 0.0], [0.0, -0.5, 3.0], [5.0, 5.0, 5.0]], jnp.float32))
    d = from_stacked(jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], jnp.float32))
    hit = jax.jit(intersect_scene)(arrays, o, d)
    surf = jax.jit(surface_attributes)(arrays, o, d, hit)

    # ray 0: straight down through the sphere top (t = 3 - 1.5 = 1.5)
    assert int(hit.kind[0]) == KIND_SPHERE
    np.testing.assert_allclose(hit.t[0], 1.5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(surf.normal.stack())[0], [0.0, 1.0, 0.0], atol=1e-5
    )
    # sphere top uv.y -> 1 - acos(1)/pi = 1 (up to the pole clip that keeps
    # acos' gradient finite, intersect.py surface_attributes)
    np.testing.assert_allclose(surf.uv.y[0], 1.0, atol=5e-4)

    # ray 1: hits the box front face (+z) at t=1
    assert int(hit.kind[1]) == KIND_CUBOID
    np.testing.assert_allclose(hit.t[1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(surf.normal.stack())[1], [0.0, 0.0, 1.0], atol=1e-5
    )

    # ray 2: miss
    assert not bool(hit.mask[2])


def test_cuboid_top_face_uv():
    cs = _one_box_scene()
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    # straight down onto the box top at (1, _, -1): uvw.x=(1+2)/4=0.75,
    # uv = (x, 1-z) -> (0.75, 1-0.25)
    o = from_stacked(jnp.asarray([[1.0, 3.0, -1.0]], jnp.float32))
    d = from_stacked(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32))
    hit = intersect_scene(arrays, o, d)
    surf = surface_attributes(arrays, o, d, hit)
    np.testing.assert_allclose(
        np.asarray(surf.normal.stack())[0], [0.0, 1.0, 0.0], atol=1e-5
    )
    np.testing.assert_allclose(surf.uv.x[0], 0.75, atol=1e-4)
    np.testing.assert_allclose(surf.uv.y[0], 0.75, atol=1e-4)


def test_plane_primitive():
    """Plane hit/normal/uv semantics (scene.rs:105-144)."""
    from hanamaru_tpu.scene.desc import PlaneDesc

    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 2, 5), target=(0, 0, 0)),
        elements=[
            PlaneDesc((0.0, 0.5, 0.0), (0.0, 1.0, 0.0), MaterialDesc(DIFFUSE)),
        ],
        skybox=SkyboxDesc(),
    )
    cs = compile_scene(scene)
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    o = from_stacked(jnp.asarray([[1.25, 3.0, -0.5], [0.0, 3.0, 0.0]], jnp.float32))
    d = from_stacked(jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32))
    hit = intersect_scene(arrays, o, d)
    surf = surface_attributes(arrays, o, d, hit)
    from hanamaru_tpu.ops.intersect import KIND_PLANE

    assert int(hit.kind[0]) == KIND_PLANE
    np.testing.assert_allclose(hit.t[0], 2.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(surf.normal.stack())[0], [0, 1, 0], atol=1e-6)
    # uv = positive modulo of world x/z (math.rs:4-7): x=1.25 -> .25, z=-0.5 -> .5
    np.testing.assert_allclose(surf.uv.x[0], 0.25, atol=1e-5)
    np.testing.assert_allclose(surf.uv.y[0], 0.5, atol=1e-5)
    # ray 1 points away -> negative t is rejected
    assert not bool(hit.mask[1])
