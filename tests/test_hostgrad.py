"""Host-chained VJP equals jax.grad over the scan-based trace."""
import jax
import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.diff import params as dp
from hanamaru_tpu.diff.hostgrad import HostGrad
from hanamaru_tpu.ops import integrator
from hanamaru_tpu.ops.camera import normalized_coords
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

T = TextureDesc


def test_hostgrad_matches_scan_grad():
    scene = SceneDesc(
        camera=CameraDesc(eye=(0, 2, 5), target=(0, 0, 0), v_fov=25.0,
                          aperture=0.1, focus_distance=5.0),
        elements=[
            CuboidDesc((-10, -1, -10), (10, 0, 10), MaterialDesc(
                DIFFUSE, albedo=T.const(0.6, 0.4, 0.2))),
            SphereDesc((1, 0.5, 0), 0.5, MaterialDesc(
                GGX, 0.7, albedo=T.const(0.8, 0.2, 0.2), roughness=T.gray(0.3))),
            SphereDesc((0, 2.5, 0), 0.3, MaterialDesc(
                DIFFUSE, albedo=T.black(), emission=T.gray(12.0))),
        ],
        skybox=SkyboxDesc(),
    )
    cs = compile_scene(scene)
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    params, rest = dp.split(arrays)
    nc = normalized_coords(16, 12, 1)
    key = jax.random.PRNGKey(5)
    bounces = 4

    def loss_on_acc(acc):
        return (acc.x + acc.y + acc.z).mean()

    hg = HostGrad(rest, cs.camera, lens_shape="circle")
    loss_h, grads_h = hg.value_and_grad(params, nc, key, bounces, loss_on_acc)

    # scan-based reference: identical rng streams (render_pass uses the same
    # key split discipline as HostGrad.radiance/raygen)
    def loss_scan(p):
        arr = dp.merge(p, rest)
        rad = integrator.render_pass(arr, cs.camera, nc, key, bounces)
        return loss_on_acc(rad)

    loss_s, grads_s = jax.jit(jax.value_and_grad(loss_scan))(params)

    np.testing.assert_allclose(float(loss_h), float(loss_s), rtol=1e-5)
    for k in grads_s:
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(jax.tree.leaves(grads_h[k])[0])),
            np.asarray(jnp.asarray(jax.tree.leaves(grads_s[k])[0])),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_hostgrad_radiance_matches_render_pass():
    from hanamaru_tpu import models

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    params, rest = dp.split(arrays)
    nc = normalized_coords(12, 8, 1)
    key = jax.random.PRNGKey(0)

    hg = HostGrad(rest, cs.camera)
    acc_h = hg.radiance(params, nc, key, 3)
    acc_s = integrator.render_pass(arrays, cs.camera, nc, key, 3)
    # separate jit programs fuse differently than one scan program, so f32
    # accumulation order differs by a few ulps (amplified through the
    # gamma-decode pow); identical streams, loose float tolerance
    np.testing.assert_allclose(
        np.asarray(acc_h.stack()), np.asarray(acc_s.stack()), rtol=0.05, atol=1e-4
    )
