"""Inverse rendering demo: recover a perturbed albedo by gradient descent
(BASELINE.json config 5, small-scale)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# long Adam schedules; run with -m "slow or not slow" (CI)
pytestmark = pytest.mark.slow

from hanamaru_tpu.diff import params as dp
from hanamaru_tpu.diff.inverse import fit, render_radiance
from hanamaru_tpu.ops.camera import normalized_coords
from hanamaru_tpu.scene.compile import compile_scene
from hanamaru_tpu.scene.desc import (
    DIFFUSE,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)

T = TextureDesc


def test_recover_floor_albedo():
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 2, 5), target=(0, 0, 0), v_fov=25.0, focus_distance=5.0),
        elements=[
            CuboidDesc((-10, -1, -10), (10, 0, 10), MaterialDesc(
                DIFFUSE, albedo=T.const(0.8, 0.3, 0.5))),
            SphereDesc((0, 3, 1), 0.5, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(30.0))),
        ],
        skybox=SkyboxDesc(),
    )
    cs = compile_scene(scene)
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    true_params, _ = dp.split(arrays)

    W, H = 24, 16
    nc = normalized_coords(W, H, 1)
    target = render_radiance(
        arrays, cs.camera, nc, jax.random.PRNGKey(99), num_bounces=2, spp=4
    )

    # perturb the floor albedo (material 0) and fit only albedo fields
    init = dict(true_params)
    init["mat_albedo_r"] = true_params["mat_albedo_r"].at[0].set(0.2)
    init["mat_albedo_g"] = true_params["mat_albedo_g"].at[0].set(0.9)
    init["mat_albedo_b"] = true_params["mat_albedo_b"].at[0].set(0.1)

    res = fit(
        cs, target, init, W, H,
        steps=200, lr=5e-2, num_bounces=2, spp=2,
        param_filter=lambda n: n.startswith("mat_albedo"),
    )
    # the paired-sample loss is itself a noisy estimate (can even dip
    # negative), so convergence is judged on the recovered parameters and
    # on the loss *trend* (mean of last 10 vs first 10)
    assert np.mean(res.losses[-10:]) < np.mean(res.losses[:10]), res.losses[::10]
    got = (
        float(res.params["mat_albedo_r"][0]),
        float(res.params["mat_albedo_g"][0]),
        float(res.params["mat_albedo_b"][0]),
    )
    np.testing.assert_allclose(got, (0.8, 0.3, 0.5), atol=0.1)


def test_inverse_demo_tool(tmp_path):
    """The flagship demo tool runs end-to-end at reduced scale on the
    8-device CPU mesh (BASELINE.json config 5; VERDICT r1 item 6): loss
    drops and the perturbed albedos move toward truth."""
    import json
    import sys

    sys.path.insert(0, "tools")
    import inverse_demo

    rc = inverse_demo.main([
        "--width", "64", "--height", "40", "--steps", "25",
        "--target-spp", "2", "--lr", "0.06",
        "--out-dir", str(tmp_path),
    ])
    assert rc == 0
    report = json.load(open(tmp_path / "report.json"))
    losses = json.load(open(tmp_path / "loss_curve.json"))
    assert losses[-1] < losses[0] * 0.7, losses
    # the red diffuse ball must have turned red-ward: r channel above g/b
    b0 = report["balls"]["ball0"]["recovered_albedo"]
    assert b0[0] > b0[1] and b0[0] > b0[2], b0
    for name in ("target.png", "initial.png", "recovered.png",
                 "recovered_params.npz"):
        assert (tmp_path / name).exists()

    # warm-start refinement: resume from the recovered parameters (same
    # process, so every jitted program is already compiled - cheap)
    rc = inverse_demo.main([
        "--width", "64", "--height", "40", "--steps", "4", "--restarts", "1",
        "--target-spp", "2", "--warm-start", str(tmp_path / "recovered_params.npz"),
        "--out-dir", str(tmp_path / "refine"),
    ])
    assert rc == 0
    refined = json.load(open(tmp_path / "refine" / "report.json"))
    # a 4-step refinement must not undo the first run's red-ward recovery
    rb0 = refined["balls"]["ball0"]["recovered_albedo"]
    assert rb0[0] > rb0[1] and rb0[0] > rb0[2], rb0


def test_project_clamps_to_physical_domain():
    """Projected-Adam helper: every differentiable field is clamped into
    its physical domain (negative GGX roughness diverges the forward
    model — alpha = roughness, material.rs:250-255); unknown fields pass
    through untouched."""
    p = {
        "mat_rough_r": jnp.array([-0.3, 0.5, 2.0]),
        "mat_albedo_g": jnp.array([1.4, -0.1, 0.6]),
        "mat_emission_b": jnp.array([-5.0, 40.0]),
        "sky_intensity": jnp.array([-1.0]),
        "sph_radius": jnp.array([0.0, 2.0]),
        "sph_cx": jnp.array([-7.5]),   # center: unbounded
    }
    q = dp.project(p)
    np.testing.assert_allclose(q["mat_rough_r"], [1e-3, 0.5, 1.0])
    np.testing.assert_allclose(q["mat_albedo_g"], [1.0, 0.0, 0.6])
    np.testing.assert_allclose(q["mat_emission_b"], [0.0, 40.0])
    np.testing.assert_allclose(q["sky_intensity"], [0.0])
    np.testing.assert_allclose(q["sph_radius"], [1e-4, 2.0])
    np.testing.assert_allclose(q["sph_cx"], [-7.5])
