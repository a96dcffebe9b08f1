"""Integrator-level behavior: furnace test, NEE, emission accounting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hanamaru_tpu.ops import integrator
from hanamaru_tpu.ops.camera import normalized_coords
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    SPECULAR,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)
from hanamaru_tpu.utils.vec import Vec2, from_stacked

T = TextureDesc


def _trace_scene(scene, o, d, key=0, bounces=9, **kw):
    cs = compile_scene(scene)
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    return integrator.trace(
        arrays, o, d, jax.random.PRNGKey(key), bounces, **kw
    )


def _rays_toward(target, n, origin=(0.0, 0.0, 5.0)):
    o = np.tile(np.asarray(origin, np.float32), (n, 1))
    d = np.tile(np.asarray(target, np.float32) - o[0], (n, 1))
    d /= np.linalg.norm(d[0])
    return from_stacked(jnp.asarray(o)), from_stacked(jnp.asarray(d))


def test_miss_returns_skybox_emission_black_sky():
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 5), target=(0, 0, 0)),
        elements=[SphereDesc((0, 0, 0), 0.5, MaterialDesc(DIFFUSE))],
        skybox=SkyboxDesc(),   # no images -> black
    )
    o, d = _rays_toward((10.0, 10.0, 10.0), 8)
    rad = _trace_scene(scene, o, d)
    np.testing.assert_allclose(np.asarray(rad.stack()), 0.0, atol=1e-7)


def test_emissive_sphere_direct_view():
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 0, 5), target=(0, 0, 0)),
        elements=[
            SphereDesc((0, 0, 0), 0.5, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.const(3.0, 2.0, 1.0))),
        ],
        skybox=SkyboxDesc(),
    )
    o, d = _rays_toward((0.0, 0.0, 0.0), 4)
    rad = _trace_scene(scene, o, d)
    v = np.asarray(rad.stack())
    # first vertex adds emission; black albedo kills the path after
    np.testing.assert_allclose(v, np.tile([3.0, 2.0, 1.0], (4, 1)), rtol=1e-5)


def test_specular_mirror_sees_light():
    """Camera ray -> mirror floor -> emissive ball: specular chains carry
    full radiance (reflectance 1, albedo white)."""
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-5, -1, -5), (5, 0, 5), MaterialDesc(SPECULAR, albedo=T.white())),
            SphereDesc((0, 3, 0), 0.5, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(7.0))),
        ],
        skybox=SkyboxDesc(),
    )
    n = 4
    # aim at the floor point that mirrors to the ball: eye (0,1,5) hits
    # (0,0,2.5)? mirror: reflected ray from floor up toward ball at (0,3,0).
    # Solve: hit p=(0,0,z); incoming dir from eye; reflected dir flips y.
    # take z s.t. reflected passes through (0,3,0): dx/dy ratio equal:
    # (z-5)/(-1) ... easier numerically: z = 1.25 works for equal slopes
    # dir in: (0,-1,z-5)/n, reflect y: (0,1,z-5)/n must align with
    # (0,3,-z)/m -> 3(z-5) = -z -> z = 15/4 = 3.75
    p = (0.0, 0.0, 3.75)
    o, d = _rays_toward(p, n, origin=(0.0, 1.0, 5.0))
    rad = _trace_scene(scene, o, d)
    v = np.asarray(rad.stack())
    np.testing.assert_allclose(v, 7.0, rtol=1e-3)


def test_nee_direct_light_on_diffuse_floor():
    """Diffuse floor + small emissive sphere: radiance must be close to the
    analytic direct irradiance E = L * r^2 * cos / d^2 / pi ... via many
    samples (NEE makes this low-variance)."""
    L = 50.0
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-20, -1, -20), (20, 0, 20), MaterialDesc(
                DIFFUSE, albedo=T.gray(0.6))),
            SphereDesc((0, 2, 0), 0.1, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(L))),
        ],
        skybox=SkyboxDesc(),
    )
    n = 4096
    o, d = _rays_toward((0.5, 0.0, 0.0), n, origin=(0.5, 3.0, 0.0))
    # nee_clamp isolates the NEE estimator (no BSDF-hit double count)
    rad = _trace_scene(scene, o, d, bounces=2, direct_light_mode="nee_clamp")
    got = float(np.asarray(rad.x).mean())
    # analytic direct light of a small sphere light via the reference
    # estimator: E = integral over the visible hemisphere of
    # L * (albedo/pi) * cos_s * |cos_l| / D^2 dA
    #   = L * (albedo/pi) * cos_s * (pi r^2) / D^2
    dvec = np.array([-0.5, 2.0, 0.0])
    dist2 = dvec @ dvec
    cos_s = (dvec / np.sqrt(dist2))[1]
    expect = 0.6 * L * cos_s * (0.1 ** 2) / dist2
    assert got == pytest.approx(expect, rel=0.1), (got, expect)


def test_direct_light_double_count_reference_vs_clamp():
    """reference mode collects direct light twice (NEE + BSDF-hit emission,
    SURVEY.md §3.4); nee_clamp collects it once -> dimmer."""
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-20, -1, -20), (20, 0, 20), MaterialDesc(
                DIFFUSE, albedo=T.gray(0.7))),
            SphereDesc((0, 1.5, 0), 0.4, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(20.0))),
        ],
        skybox=SkyboxDesc(),
    )
    n = 8192
    o, d = _rays_toward((0.3, 0.0, 0.3), n, origin=(0.0, 2.5, 2.5))
    ref = float(np.asarray(_trace_scene(scene, o, d, bounces=3).x).mean())
    clamp = float(
        np.asarray(
            _trace_scene(scene, o, d, bounces=3, direct_light_mode="nee_clamp").x
        ).mean()
    )
    assert ref > clamp * 1.3, (ref, clamp)


def test_strict_reference_rng_same_marginals():
    """strict_reference_rng=True shares one uniform pair per bounce
    between the BSDF sample and NEE (renderer.rs:175,183).  Per-lane
    values change (the NEE randoms are now the BSDF randoms), but the
    estimator's expectation is identical — both modes must agree with
    the analytic direct-light value of the NEE scene above."""
    L = 50.0
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 1, 5), target=(0, 0, 0)),
        elements=[
            CuboidDesc((-20, -1, -20), (20, 0, 20), MaterialDesc(
                DIFFUSE, albedo=T.gray(0.6))),
            SphereDesc((0, 2, 0), 0.1, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(L))),
        ],
        skybox=SkyboxDesc(),
    )
    n = 4096
    o, d = _rays_toward((0.5, 0.0, 0.0), n, origin=(0.5, 3.0, 0.0))
    loose = _trace_scene(scene, o, d, bounces=2, direct_light_mode="nee_clamp")
    strict = _trace_scene(scene, o, d, bounces=2, direct_light_mode="nee_clamp",
                          strict_reference_rng=True)
    lm = float(np.asarray(loose.x).mean())
    sm = float(np.asarray(strict.x).mean())
    dvec = np.array([-0.5, 2.0, 0.0])
    dist2 = dvec @ dvec
    expect = 0.6 * L * (dvec / np.sqrt(dist2))[1] * (0.1 ** 2) / dist2
    assert sm == pytest.approx(expect, rel=0.1), (sm, expect)
    assert sm == pytest.approx(lm, rel=0.1), (sm, lm)
    # but the coupling really changed: per-lane radiance is not identical
    assert not np.allclose(np.asarray(strict.x), np.asarray(loose.x))


def test_render_pass_finite_on_full_scene():
    from hanamaru_tpu import models

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    nc = normalized_coords(32, 18, 2)
    rad = integrator.render_pass(arrays, cs.camera, nc, jax.random.PRNGKey(0), 9)
    v = np.asarray(rad.stack())
    assert np.all(np.isfinite(v))
    assert np.all(v >= 0)
    assert v.mean() > 0.01


def test_debug_modes_run():
    from hanamaru_tpu import models

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    nc = normalized_coords(16, 9, 1)
    for mode in ("shading", "normal", "depth", "focal_plane"):
        out = integrator.debug_pass(arrays, cs.camera, nc, mode)
        assert np.all(np.isfinite(np.asarray(out.stack()))), mode


def test_rng_streams_independent_across_bounce_chunk_pass():
    """The progressive loop derives every random stream by folding
    (pass, chunk, bounce) into one base key (VERDICT r1 weak item 6);
    assert the streams it hands the integrator are pairwise distinct:
    per-bounce within a chunk, per-chunk within a pass, per-pass, and
    bsdf-vs-NEE within a bounce."""
    import itertools

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 64
    streams = {}
    for pass_idx, chunk_idx, bounce_idx in itertools.product(
        range(2), range(2), range(3)
    ):
        key = jax.random.fold_in(jax.random.PRNGKey(8700304), pass_idx)
        _, k_path = jax.random.split(key)
        k_chunk = jax.random.fold_in(k_path, chunk_idx)  # progressive.py:229
        kb = jax.random.fold_in(k_chunk, bounce_idx)     # bounce_step
        k_bsdf, k_nee = jax.random.split(kb)
        for name, k in (("bsdf", k_bsdf), ("nee", k_nee)):
            k1, _ = jax.random.split(k)
            streams[(pass_idx, chunk_idx, bounce_idx, name)] = np.asarray(
                jax.random.uniform(k1, (n,), jnp.float32)
            )
    keys = list(streams)
    for a, b in itertools.combinations(keys, 2):
        assert not np.array_equal(streams[a], streams[b]), (a, b)
        # decorrelated, not just unequal
        corr = np.corrcoef(streams[a], streams[b])[0, 1]
        assert abs(corr) < 0.5, (a, b, corr)

    # raygen's lens stream (fold_in(key, chunk) then split) is distinct
    # from every path stream
    key = jax.random.fold_in(jax.random.PRNGKey(8700304), 1)
    k_lens, _ = jax.random.split(jax.random.fold_in(key, 0))
    k1, _ = jax.random.split(k_lens)
    lens = np.asarray(jax.random.uniform(k1, (n,), jnp.float32))
    for a in keys:
        assert not np.array_equal(lens, streams[a])
