"""Pallas tile-uniform traversal matches the XLA lockstep traversal
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.config import INF
from hanamaru_tpu.ops.intersect import KIND_TRIANGLE, intersect_scene
from hanamaru_tpu.ops.traverse_pallas import TILE, traverse_tiles
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    CameraDesc,
    MaterialDesc,
    MeshDesc,
    SceneDesc,
    SkyboxDesc,
)
from hanamaru_tpu.utils.vec import from_stacked


def _mesh_scene(rng, t=400):
    base = rng.uniform(-2, 2, (t, 1, 3))
    tri = base + rng.uniform(-0.4, 0.4, (t, 3, 3))
    verts = tri.reshape(-1, 3)
    faces = np.arange(3 * t, dtype=np.int32).reshape(t, 3)
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 6), target=(0, 0, 0)),
        elements=[MeshDesc(material=MaterialDesc(DIFFUSE), vertices=verts, faces=faces)],
        skybox=SkyboxDesc(),
    )
    return compile_scene(scene)


def test_pallas_traversal_matches_xla(rng):
    cs = _mesh_scene(rng)
    s = jax.tree.map(jnp.asarray, cs.arrays)

    n = TILE
    o = np.tile([[0.0, 0.0, 6.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = from_stacked(jnp.asarray(o))
    dv = from_stacked(jnp.asarray(d))

    ref = intersect_scene(s, ov, dv)

    t0 = jnp.full((n,), INF, jnp.float32)
    t, idx = traverse_tiles(
        ov.x, ov.y, ov.z, dv.x, dv.y, dv.z, t0,
        s.bvh_min_x, s.bvh_min_y, s.bvh_min_z,
        s.bvh_max_x, s.bvh_max_y, s.bvh_max_z,
        s.bvh_hit, s.bvh_miss, s.bvh_first, s.bvh_count,
        s.tri_v0x, s.tri_v0y, s.tri_v0z,
        s.tri_e1x, s.tri_e1y, s.tri_e1z,
        s.tri_e2x, s.tri_e2y, s.tri_e2z,
        interpret=True,
    )

    hit_ref = np.asarray(ref.kind) == KIND_TRIANGLE
    hit_pal = np.asarray(idx) >= 0
    np.testing.assert_array_equal(hit_pal, hit_ref)
    np.testing.assert_allclose(
        np.asarray(t)[hit_pal], np.asarray(ref.t)[hit_ref], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idx)[hit_pal], np.asarray(ref.idx)[hit_ref])
