"""Pallas tile-uniform traversal matches the XLA lockstep traversal
(interpret mode on CPU).

The kernel itself (SMEM node walk + VMEM leaf rows) is exercised on the
real chip by tools/pallas_bench.py; these tests pin down semantics:
parity with intersect_scene, padding behavior, and dead-lane masking.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanamaru_tpu.config import INF
from hanamaru_tpu.ops.intersect import KIND_TRIANGLE, intersect_scene
from hanamaru_tpu.ops.traverse_pallas import TILE, traverse_scene_pallas
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


def _rays(rng, n):
    o = np.tile([[0.0, 0.0, 6.0]], (n, 1)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] -= 1.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return from_stacked(jnp.asarray(o)), from_stacked(jnp.asarray(d))


def _check_against_xla(s, ov, dv, t, idx):
    ref = intersect_scene(s, ov, dv)
    hit_ref = np.asarray(ref.kind) == KIND_TRIANGLE
    hit_pal = np.asarray(idx) >= 0
    np.testing.assert_array_equal(hit_pal, hit_ref)
    np.testing.assert_allclose(
        np.asarray(t)[hit_pal], np.asarray(ref.t)[hit_ref], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(idx)[hit_pal], np.asarray(ref.idx)[hit_ref]
    )


def test_pallas_traversal_matches_xla(rng):
    cs = _mesh_scene(rng)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    ov, dv = _rays(rng, TILE)
    t0 = jnp.full((TILE,), INF, jnp.float32)
    t, idx = traverse_scene_pallas(s, ov, dv, t0, interpret=True)
    _check_against_xla(s, ov, dv, t, idx)


def test_pallas_traversal_pads_ragged_batches(rng):
    cs = _mesh_scene(rng, t=150)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    n = TILE + 137  # not a multiple of TILE → wrapper must pad + unpad
    ov, dv = _rays(rng, n)
    t0 = jnp.full((n,), INF, jnp.float32)
    t, idx = traverse_scene_pallas(s, ov, dv, t0, interpret=True)
    assert t.shape == (n,) and idx.shape == (n,)
    _check_against_xla(s, ov, dv, t, idx)


def test_pallas_traversal_masks_dead_lanes(rng):
    cs = _mesh_scene(rng, t=150)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    ov, dv = _rays(rng, TILE)
    t0 = jnp.full((TILE,), INF, jnp.float32)
    alive = jnp.asarray(rng.uniform(size=TILE) < 0.5)
    t, idx = traverse_scene_pallas(s, ov, dv, t0, active=alive, interpret=True)
    # dead lanes never hit
    dead = ~np.asarray(alive)
    assert (np.asarray(idx)[dead] == -1).all()
    # live lanes agree with an unmasked run
    t_all, idx_all = traverse_scene_pallas(s, ov, dv, t0, interpret=True)
    live = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(idx)[live], np.asarray(idx_all)[live])
    np.testing.assert_array_equal(np.asarray(t)[live], np.asarray(t_all)[live])


def test_pallas_traversal_respects_t0_bound(rng):
    """Incoming t0 (e.g. closest sphere/cuboid hit) upper-bounds accepted
    triangle hits, mirroring intersect_scene's shared-closest semantics."""
    cs = _mesh_scene(rng, t=150)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    ov, dv = _rays(rng, TILE)
    inf0 = jnp.full((TILE,), INF, jnp.float32)
    t_all, idx_all = traverse_scene_pallas(s, ov, dv, inf0, interpret=True)
    # clamp t0 just below each found hit: the kernel must now reject it
    has = np.asarray(idx_all) >= 0
    t0 = jnp.where(jnp.asarray(has), t_all * 0.5, inf0)
    t2, idx2 = traverse_scene_pallas(s, ov, dv, t0, interpret=True)
    a2 = np.asarray(idx2)
    # any surviving hit must beat the tightened bound
    surv = a2 >= 0
    assert (np.asarray(t2)[surv] < np.asarray(t0)[surv]).all()
    # rays whose only hit was the clamped one now return -1 unless a nearer
    # triangle exists; at minimum no hit at the old distance survives
    same = surv & has
    assert (np.asarray(t2)[same] < np.asarray(t_all)[same]).all()


def test_intersect_scene_pallas_backend_parity(rng):
    """intersect_scene(traversal="pallas_interpret") merges triangle +
    primitive hits identically to the XLA walk, including shadow-style
    t_max capping and dead lanes."""
    from hanamaru_tpu.scene.desc import CuboidDesc, SphereDesc

    t = 200
    base = rng.uniform(-2, 2, (t, 1, 3))
    tri = base + rng.uniform(-0.4, 0.4, (t, 3, 3))
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 6), target=(0, 0, 0)),
        elements=[
            MeshDesc(material=MaterialDesc(DIFFUSE),
                     vertices=tri.reshape(-1, 3),
                     faces=np.arange(3 * t, dtype=np.int32).reshape(t, 3)),
            SphereDesc((0.5, 0.0, 1.0), 0.7, MaterialDesc(DIFFUSE)),
            CuboidDesc((-3, -3, -3), (-2, 3, 3), MaterialDesc(DIFFUSE)),
        ],
        skybox=SkyboxDesc(),
    )
    cs = compile_scene(scene)
    s = jax.tree.map(jnp.asarray, cs.arrays)
    n = 512
    ov, dv = _rays(rng, n)
    alive = jnp.asarray(rng.uniform(size=n) < 0.8)
    t_max = jnp.asarray(
        np.where(rng.uniform(size=n) < 0.5, 5.0, np.float32(INF)).astype(np.float32)
    )

    a = intersect_scene(s, ov, dv, active=alive, t_max=t_max)
    b = intersect_scene(
        s, ov, dv, active=alive, t_max=t_max, traversal="pallas_interpret"
    )
    np.testing.assert_array_equal(np.asarray(a.kind), np.asarray(b.kind))
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-6)
