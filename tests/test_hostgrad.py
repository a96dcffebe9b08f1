"""Host-chained VJP equals jax.grad over the scan-based trace —
at span=1 (one bounce per jitted call) and at span>1 (k bounces folded
into one program with per-bounce jax.checkpoint; docs/perf.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


BOUNCES = 4


@pytest.fixture(scope="module")
def scan_reference():
    """Tiny 3-element scene + jax.grad over the scan-based trace, computed
    ONCE and shared by every span case (the scan-grad compile dominates
    this file's runtime)."""
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

    def loss_on_acc(acc):
        return (acc.x + acc.y + acc.z).mean()

    # scan-based reference: identical rng streams (render_pass uses the same
    # key split discipline as HostGrad.radiance/raygen)
    def loss_scan(p):
        arr = dp.merge(p, rest)
        rad = integrator.render_pass(arr, cs.camera, nc, key, BOUNCES)
        return loss_on_acc(rad)

    loss_s, grads_s = jax.jit(jax.value_and_grad(loss_scan))(params)
    return dict(cs=cs, params=params, rest=rest, nc=nc, key=key,
                loss_on_acc=loss_on_acc, loss_s=loss_s, grads_s=grads_s)


def test_hostgrad_matches_scan_grad(scan_reference):
    """span=1: the host chain's building block vs jax.grad over the scan."""
    r = scan_reference
    hg = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle")
    loss_h, grads_h = hg.value_and_grad(
        r["params"], r["nc"], r["key"], BOUNCES, r["loss_on_acc"])

    np.testing.assert_allclose(float(loss_h), float(r["loss_s"]), rtol=1e-5)
    for k in r["grads_s"]:
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(jax.tree.leaves(grads_h[k])[0])),
            np.asarray(jnp.asarray(jax.tree.leaves(r["grads_s"][k])[0])),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


@pytest.mark.slow
def test_hostgrad_span2_matches_span1(scan_reference):
    """span=2 (two bounces folded into one jitted program: unrolled VJP,
    per-bounce jax.checkpoint, hit-replay indexing across the span) must
    produce the gradients of the span=1 chain — which the default-suite
    test above pins to jax.grad over the scan trace, so equality here is
    transitively equality with the scan gradient at the same rtol.

    Slow tier: XLA:CPU needs ~4-6 min to compile the 2-bounce transpose
    (measured 2026-08-21; per-bounce jax.checkpoint does not help the
    CPU backend's compile pathology — docs/perf.md "span" notes).  The
    production span=3 x 9-bounce configuration is exercised on the TPU
    backend by bench.py / tools/grad_profile.py --span, where the span
    fold is a measured dispatch-latency win rather than a compile
    liability."""
    r = scan_reference
    bounces = 2
    hg1 = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=1)
    loss_1, grads_1 = hg1.value_and_grad(
        r["params"], r["nc"], r["key"], bounces, r["loss_on_acc"])
    hg2 = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=2)
    loss_2, grads_2 = hg2.value_and_grad(
        r["params"], r["nc"], r["key"], bounces, r["loss_on_acc"])

    np.testing.assert_allclose(float(loss_2), float(loss_1), rtol=1e-5)
    for k in grads_1:
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(jax.tree.leaves(grads_2[k])[0])),
            np.asarray(jnp.asarray(jax.tree.leaves(grads_1[k])[0])),
            rtol=2e-4, atol=1e-6, err_msg=f"{k} (span=2 vs span=1)",
        )


@pytest.mark.slow
def test_hostgrad_multi_span_chain_matches_scan_grad(scan_reference):
    """span=2 over BOUNCES=4: TWO spans per chain, so the backward host
    loop runs more than one bwd dispatch and must thread the running
    cotangents (`grads_in` accumulation) across span boundaries — the
    structure the production span=3 x 9-bounce configuration relies on
    (bench.py GRAD_SPAN), which the single-span cases above never
    exercise.  Compared against the module-scoped jax.grad-over-scan
    reference, so the only new compile is the span=2 program pair."""
    r = scan_reference
    hg = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=2)
    loss_h, grads_h = hg.value_and_grad(
        r["params"], r["nc"], r["key"], BOUNCES, r["loss_on_acc"])

    np.testing.assert_allclose(float(loss_h), float(r["loss_s"]), rtol=1e-5)
    for k in r["grads_s"]:
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(jax.tree.leaves(grads_h[k])[0])),
            np.asarray(jnp.asarray(jax.tree.leaves(r["grads_s"][k])[0])),
            rtol=2e-4, atol=1e-6, err_msg=f"{k} (span=2 x 2 spans vs scan)",
        )


def test_hostgrad_fused_matches_chain(scan_reference):
    """value_and_grad_fused (raygen+fwd+loss+VJP as ONE program, the
    round-5 single-dispatch lever) equals the chained path at
    span=1 / 1 bounce — the cheapest compile that still exercises the
    whole fused wiring (in-program raygen, in-program loss cotangent,
    hit-replay VJP)."""
    r = scan_reference
    hg = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=1)
    loss_c, grads_c = hg.value_and_grad(
        r["params"], r["nc"], r["key"], 1, r["loss_on_acc"])
    loss_f, grads_f = hg.value_and_grad_fused(
        r["params"], r["nc"], r["key"], 1, r["loss_on_acc"])

    np.testing.assert_allclose(float(loss_f), float(loss_c), rtol=1e-6)
    for k in grads_c:
        for lc, lf in zip(jax.tree.leaves(grads_c[k]),
                          jax.tree.leaves(grads_f[k])):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(lc),
                rtol=2e-5, atol=1e-7, err_msg=f"{k} (fused vs chain)",
            )


@pytest.mark.slow
def test_hostgrad_fused_span2_matches_chain(scan_reference):
    """Fused program at span=2 over 2 bounces (per-bounce jax.checkpoint
    inside the fused VJP) vs the span=1 chained path.  Slow tier for the
    same XLA:CPU k-bounce-transpose compile cost as the span=2 chained
    case above; the production span=9 fused configuration runs on the
    TPU backend (bench.py)."""
    r = scan_reference
    bounces = 2
    hg1 = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=1)
    loss_1, grads_1 = hg1.value_and_grad(
        r["params"], r["nc"], r["key"], bounces, r["loss_on_acc"])
    hg2 = HostGrad(r["rest"], r["cs"].camera, lens_shape="circle", span=2)
    loss_f, grads_f = hg2.value_and_grad_fused(
        r["params"], r["nc"], r["key"], bounces, r["loss_on_acc"])

    np.testing.assert_allclose(float(loss_f), float(loss_1), rtol=1e-5)
    for k in grads_1:
        for lc, lf in zip(jax.tree.leaves(grads_1[k]),
                          jax.tree.leaves(grads_f[k])):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(lc),
                rtol=2e-4, atol=1e-6, err_msg=f"{k} (fused span=2 vs chain)",
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
