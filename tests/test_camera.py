import jax.numpy as jnp
import numpy as np

from hanamaru_tpu.ops.camera import normalized_coords, ray_pinhole, ray_with_dof
from hanamaru_tpu.scene.compile import compile_camera
from hanamaru_tpu.scene.desc import CameraDesc
from hanamaru_tpu.utils.vec import Vec2


def _cam(aperture=0.0):
    return compile_camera(
        CameraDesc(
            eye=(0.0, 2.0, 9.0), target=(0.0, 1.0, 0.0), v_fov=10.0,
            aperture=aperture, focus_distance=8.8,
        )
    )


def test_camera_basis_orthonormal():
    cam = _cam()
    f = np.array([cam.forward.x, cam.forward.y, cam.forward.z])
    r = np.array([cam.right.x, cam.right.y, cam.right.z])
    u = np.array([cam.up.x, cam.up.y, cam.up.z])
    for v in (f, r, u):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    np.testing.assert_allclose(f @ r, 0.0, atol=1e-7)
    np.testing.assert_allclose(f @ u, 0.0, atol=1e-7)
    # tan(full fov) quirk (camera.rs:48)
    phh = np.linalg.norm(
        [cam.plane_half_right.x, cam.plane_half_right.y, cam.plane_half_right.z]
    )
    np.testing.assert_allclose(phh, np.tan(np.radians(10.0)) * 8.8, rtol=1e-5)


def test_center_ray_points_at_target():
    cam = _cam()
    nc = Vec2(jnp.asarray([0.0]), jnp.asarray([0.0]))
    o, d = ray_pinhole(cam, nc)
    f = np.array([cam.forward.x, cam.forward.y, cam.forward.z])
    np.testing.assert_allclose(np.asarray(d.stack()).ravel(), f, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o.stack()).ravel(), [0.0, 2.0, 9.0], atol=1e-6)


def test_zero_aperture_dof_equals_pinhole():
    cam = _cam(aperture=0.0)
    nc = Vec2(jnp.asarray([0.3, -0.2]), jnp.asarray([0.1, 0.4]))
    u = jnp.asarray([0.7, 0.3])
    o1, d1 = ray_with_dof(cam, nc, u, u)
    o2, d2 = ray_pinhole(cam, nc)
    np.testing.assert_allclose(o1.stack(), o2.stack(), atol=1e-6)
    np.testing.assert_allclose(d1.stack(), d2.stack(), atol=1e-6)


def test_dof_rays_converge_at_focal_plane():
    cam = _cam(aperture=0.4)
    nc = Vec2(jnp.asarray([0.25] * 8), jnp.asarray([-0.15] * 8))
    u1 = jnp.linspace(0.05, 0.95, 8)
    u2 = jnp.linspace(0.1, 0.9, 8)
    o, d = ray_with_dof(cam, nc, u1, u2)
    # points at t where the ray crosses the focal plane must coincide
    f = np.array([cam.forward.x, cam.forward.y, cam.forward.z])
    eye = np.array([cam.eye.x, cam.eye.y, cam.eye.z])
    on = np.asarray(o.stack())
    dn = np.asarray(d.stack())
    t = (cam.focus_distance - (on - eye) @ f) / (dn @ f)
    pts = on + dn * t[:, None]
    assert np.abs(pts - pts[0]).max() < 1e-4


def test_normalized_coords_layout():
    # 4x2 image, ss=1: pixel centers; y flipped (renderer.rs:36),
    # scaled by min dimension (renderer.rs:54)
    nc = normalized_coords(4, 2, 1)
    nx = np.asarray(nc.x).reshape(2, 4)
    ny = np.asarray(nc.y).reshape(2, 4)
    # frag_x=0 -> ((0-0.5)*2-4)/2 = -2.5
    np.testing.assert_allclose(nx[0, 0], (2 * (0 - 0.5) - 4) / 2.0)
    # top row y: frag_y = 2-0 = 2 -> ((2-0.5)*2-2)/2 = 0.5
    np.testing.assert_allclose(ny[0, 0], (2 * (2 - 0.5) - 2) / 2.0)
    # bottom row lower than top
    assert ny[1, 0] < ny[0, 0]


def test_normalized_coords_supersample_offsets():
    nc = normalized_coords(2, 2, 2)
    # 4 subsamples per pixel, offsets {-0.5, 0}
    assert nc.x.shape[0] == 2 * 2 * 4
    xs = np.unique(np.round(np.asarray(nc.x), 6))
    # frag 0 and 1 with offsets -0.5, 0 -> fx in {-.5,0,.5,1} -> nc=(2fx-2)/2
    np.testing.assert_allclose(xs, [-1.5, -1.0, -0.5, 0.0])
