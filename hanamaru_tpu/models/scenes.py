"""The reference scene set, expressed as data.

Each builder mirrors a reference scene constructor (reference:
src/main.rs:54-1212) — cameras, materials, transforms and asset paths are
value-for-value identical.  Procedurally placed elements (rtcamp5, tbf3,
rtcamp6_v2) draw from a bit-parity port of rand 0.3.22's StdRng
(utils/stdrng.py) with the reference's seeds (main.rs:253, 503, 805)
through the same collision-checked rejection loop (scene.rs:366-376), so
the placements are bit-identical to the reference's (validated
structurally against its committed rtcamp5.png / fractal.png renders).
"""
from __future__ import annotations

import math

import numpy as np

from ..config import PI, PI2
from ..scene import matrix as M
from ..utils.stdrng import StdRng
from ..scene.desc import (
    GGX,
    GGX_REFRACTION,
    DIFFUSE,
    REFRACTION,
    SPECULAR,
    CameraDesc,
    CuboidDesc,
    MaterialDesc,
    MeshDesc,
    SceneDesc,
    SkyboxDesc,
    SphereDesc,
    TextureDesc,
)
from . import asset_root, register

T = TextureDesc


def _hsv(h: float, s: float, v: float) -> tuple[float, float, float]:
    """Host-side mirror of color.rs:51-61."""

    def sat(x):
        return min(max(x, 0.0), 1.0)

    hr = sat(abs(h * 6.0 - 3.0) - 1.0)
    hg = sat(2.0 - abs(h * 6.0 - 2.0))
    hb = sat(2.0 - abs(h * 6.0 - 4.0))
    return (
        ((hr - 1.0) * s + 1.0) * v,
        ((hg - 1.0) * s + 1.0) * v,
        ((hb - 1.0) * s + 1.0) * v,
    )


def _skybox(name: str, intensity=(1.0, 1.0, 1.0)) -> SkyboxDesc:
    base = f"textures/cube/{name}"
    return SkyboxDesc(
        px=f"{base}/posx.jpg",
        nx=f"{base}/negx.jpg",
        py=f"{base}/posy.jpg",
        ny=f"{base}/negy.jpg",
        pz=f"{base}/posz.jpg",
        nz=f"{base}/negz.jpg",
        intensity=intensity,
    )


_CHECKER_ALBEDO = "textures/2d/checkered_diagonal_10_0.5_1.0_512.png"
_CHECKER_ROUGH = "textures/2d/checkered_diagonal_10_0.1_0.6_512.png"
_MARBLE_ALBEDO = "textures/2d/MarbleFloorTiles2/TexturesCom_MarbleFloorTiles2_1024_c_diffuse.tiff"
_MARBLE_ROUGH = "textures/2d/MarbleFloorTiles2/TexturesCom_MarbleFloorTiles2_1024_roughness.png"
_EARTH = "textures/2d/earth_inverse_2048.jpg"


def _floor(surface: int, param: float, albedo: T, rough: T, size: float = 5.0) -> CuboidDesc:
    return CuboidDesc(
        aabb_min=(-size, -1.0, -size),
        aabb_max=(size, 0.0, size),
        material=MaterialDesc(
            surface=surface, param=param, albedo=albedo, emission=T.black(), roughness=rough
        ),
    )


@register("simple")
def simple() -> SceneDesc:
    """main.rs:54-136."""
    r = 0.6
    return SceneDesc(
        name="simple",
        camera=CameraDesc(
            eye=(0.0, 2.0, 9.0), target=(0.0, 1.0, 0.0), v_fov=10.0,
            lens_shape="circle", aperture=0.0, focus_distance=8.8,
        ),
        elements=[
            SphereDesc((0.0, r, 0.0), r, MaterialDesc(
                DIFFUSE, 0.0, T.white(), T.black(), T.gray(0.99))),
            SphereDesc((3.0, 2.0 + r, -2.0), r * 0.2, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.const(200.0, 10.0, 10.0), T.gray(0.05))),
            SphereDesc((-3.0, 2.0 + r, -2.0), r * 0.2, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.const(10.0, 200.0, 10.0), T.gray(0.05))),
            _floor(GGX, 0.8, T.image(_CHECKER_ALBEDO), T.image(_CHECKER_ROUGH)),
        ],
        skybox=_skybox("LancellottiChapel", intensity=(0.0, 0.0, 0.0)),
    )


@register("material_examples")
def material_examples() -> SceneDesc:
    """main.rs:139-249 — the 5-BSDF ball lineup."""
    r = 0.4
    ball = lambda x, mat: SphereDesc((x, r, 0.0), r, mat)
    rough = T.gray(0.05)
    return SceneDesc(
        name="material_examples",
        camera=CameraDesc(
            eye=(0.0, 2.0, 9.0), target=(0.0, 1.0, 0.0), v_fov=10.0,
            lens_shape="circle", aperture=0.2, focus_distance=8.8,
        ),
        elements=[
            ball(-2.0, MaterialDesc(DIFFUSE, 0.0, T.white(), T.black(), rough)),
            ball(-1.0, MaterialDesc(GGX, 0.8, T.white(), T.black(), rough)),
            ball(0.0, MaterialDesc(SPECULAR, 0.0, T.white(), T.black(), rough)),
            ball(1.0, MaterialDesc(REFRACTION, 1.5, T.white(), T.black(), rough)),
            ball(2.0, MaterialDesc(GGX_REFRACTION, 1.5, T.white(), T.black(), rough)),
            SphereDesc((0.0, 2.0 + r, -2.0), r, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.gray(20.0), rough)),
            _floor(DIFFUSE, 0.0, T.image(_CHECKER_ALBEDO), T.image(_CHECKER_ROUGH)),
        ],
        skybox=_skybox("LancellottiChapel"),
    )


_DIA_MAT = MaterialDesc(REFRACTION, 2.42, T.white(), T.black(), T.black())


def _dia(px, py, pz, s, ry, rx) -> MeshDesc:
    return MeshDesc(
        path="models/dia/dia.obj",
        matrix=M.translate(px, py, pz) @ M.scale_linear(s) @ M.rotate_y(ry) @ M.rotate_x(rx),
        material=_DIA_MAT,
    )


@register("rtcamp5")
def rtcamp5() -> SceneDesc:
    """main.rs:252-499 — bunnies + dias + seeded random placement."""
    rng = StdRng([870, 2000, 304, 2])   # main.rs:253
    scene = SceneDesc(
        name="rtcamp5",
        camera=CameraDesc(
            eye=(0.0, 2.5, 9.0), target=(0.0, 1.0, 0.0), v_fov=17.0,
            lens_shape="circle", aperture=0.15, focus_distance=8.5,
        ),
        elements=[
            MeshDesc(
                path="models/bunny/bunny_face1000.obj",
                matrix=M.scale_linear(1.5) @ M.translate(1.2, 0.0, 0.0) @ M.rotate_y(0.2),
                material=MaterialDesc(REFRACTION, 1.5, T.const(0.7, 0.7, 1.0), T.black(), T.gray(0.1)),
            ),
            MeshDesc(
                path="models/bunny/bunny_face1000_flip.obj",
                matrix=M.scale(1.5, 1.5, 1.5) @ M.translate(-1.2, 0.0, 0.0) @ M.rotate_y(-0.2),
                material=MaterialDesc(GGX, 0.8, T.const(1.0, 0.04, 0.04), T.black(), T.gray(0.1)),
            ),
            MeshDesc(
                path="models/dia/dia.obj",
                matrix=M.translate(3.1, 0.0, 0.8) @ M.scale_linear(1.0) @ M.rotate_y(-0.5)
                @ M.rotate_x(math.radians(40.35)),
                material=_DIA_MAT,
            ),
            SphereDesc((0.0, 0.5, -0.5), 0.5, MaterialDesc(
                GGX, 0.8, T.white(), T.image(_EARTH, (5.0, 5.0, 2.0)), T.gray(0.05))),
            SphereDesc((-3.5, 0.5, 0.0), 0.5, MaterialDesc(
                GGX, 0.8, T.white(), T.black(), T.image(_EARTH))),
            SphereDesc((0.5018854352719382, 0.3899602675366644, 1.8484239850862165),
                       0.3899602675366644,
                       MaterialDesc(GGX, 0.8, T.const(*_hsv(0.2, 1.0, 1.0)), T.black(), T.gray(0.01))),
            SphereDesc((-0.5748933256792994, 0.2951263257801348, 2.266298272012876),
                       0.2951263257801348,
                       MaterialDesc(GGX, 0.8, T.const(*_hsv(0.4, 1.0, 1.0)), T.black(), T.gray(0.05))),
            SphereDesc((-0.9865234498515534, 0.3386858117447873, 2.9809338871934585),
                       0.3386858117447873,
                       MaterialDesc(GGX, 0.8, T.const(*_hsv(0.6, 1.0, 1.0)), T.black(), T.gray(0.02))),
            SphereDesc((0.6946459502665004, 0.2764689077971783, 2.7455446851003025),
                       0.2764689077971783,
                       MaterialDesc(GGX, 0.8, T.const(*_hsv(0.05, 1.0, 1.0)), T.black(), T.gray(0.0))),
            SphereDesc((3.7027464198816952, 0.3917608374245498, -0.40505849281451556),
                       0.3917608374245498,
                       MaterialDesc(GGX, 0.8, T.const(*_hsv(0.8, 1.0, 1.0)), T.black(), T.gray(0.1))),
            _floor(GGX, 0.8, T.image(_MARBLE_ALBEDO), T.image(_MARBLE_ROUGH)),
        ],
        skybox=_skybox("LancellottiChapel"),
    )
    root = asset_root()
    # diamonds on the floor (main.rs:452-472)
    count = 0
    while count < 12:
        px = rng.uniform(-4.5, 4.5)
        pz = rng.uniform(-2.5, 4.5)
        s = rng.uniform(0.7, 1.1)
        ry = rng.uniform(-PI, PI)
        if scene.add_with_check_collisions(
            _dia(px, 0.0, pz, s, ry, math.radians(40.35)), root
        ):
            count += 1
    # floating diamonds (main.rs:474-496)
    count = 0
    while count < 30:
        px = rng.uniform(-4.5, 4.5)
        py = rng.uniform(0.0, 4.0)
        pz = rng.uniform(-4.5, 3.5)
        s = rng.uniform(0.6, 1.1)
        ry = rng.uniform(-PI, PI)
        rx = rng.uniform(-PI, PI)
        if scene.add_with_check_collisions(_dia(px, py, pz, s, ry, rx), root):
            count += 1
    return scene


@register("tbf3")
def tbf3() -> SceneDesc:
    """main.rs:502-722."""
    rng = StdRng([870, 2000, 304, 1])   # main.rs:503
    earth_mat = lambda alb, emi: MaterialDesc(GGX, 0.8, alb, emi, T.gray(0.01))
    scene = SceneDesc(
        name="tbf3",
        camera=CameraDesc(
            eye=(0.0, 2.5, 9.0), target=(0.0, 1.5, 0.0), v_fov=19.0,
            lens_shape="circle", aperture=0.18, focus_distance=7.0,
        ),
        elements=[
            MeshDesc(
                path="models/klab_logo/klab_logo_triangle.obj",
                matrix=M.scale_linear(0.4) @ M.translate(0.0, 3.1782, 2.0) @ M.rotate_y(-0.5),
                material=MaterialDesc(GGX, 0.8, T.const(0.4, 0.4, 1.0), T.black(), T.gray(0.05)),
            ),
            MeshDesc(
                path="models/dia/dia.obj",
                matrix=M.translate(1.3, 0.0, 2.2) @ M.scale_linear(1.0) @ M.rotate_y(-0.4)
                @ M.rotate_x(math.radians(40.35)),
                material=_DIA_MAT,
            ),
            MeshDesc(
                path="models/dia/dia.obj",
                matrix=M.translate(-0.1, 0.0, 2.4) @ M.scale_linear(1.0) @ M.rotate_y(-1.4)
                @ M.rotate_x(math.radians(40.35)),
                material=_DIA_MAT,
            ),
            SphereDesc((-1.0, 0.4, 4.0), 0.4,
                       earth_mat(T.white(), T.image(_EARTH, (3.0, 3.0, 1.1)))),
            SphereDesc((-3.0, 0.4, -3.5), 0.4,
                       earth_mat(T.const(0.5, 1.0, 1.0), T.image(_EARTH, (1.0, 3.0, 3.5)))),
            SphereDesc((4.0, 0.2, -4.5), 0.2,
                       earth_mat(T.const(0.3, 0.7, 1.0), T.image(_EARTH, (3.0, 3.0, 1.1)))),
            SphereDesc((3.0, 0.2, -4.2), 0.2,
                       earth_mat(T.const(1.0, 0.7, 0.9), T.image(_EARTH, (2.0, 3.0, 1.0)))),
            _floor(GGX, 0.8, T.image(_MARBLE_ALBEDO), T.image(_MARBLE_ROUGH)),
        ],
        skybox=_skybox("LancellottiChapel", intensity=(2.0, 2.0, 3.0)),
    )
    root = asset_root()
    # metal spheres (main.rs:650-672)
    count = 0
    while count < 8:
        px = rng.uniform(-3.0, 3.0)
        pz = rng.uniform(-5.0, 5.0)
        r = rng.uniform(0.2, 0.4)
        rough = rng.uniform(0.0, 0.2)
        if scene.add_with_check_collisions(
            SphereDesc((px, r, pz), r, MaterialDesc(
                GGX, 0.8, T.const(*_hsv(0.2 + 0.1 * count, 1.0, 1.0)), T.black(), T.gray(rough))),
            root,
        ):
            count += 1
    # diamonds on the floor (main.rs:674-695)
    count = 0
    while count < 20:
        px = rng.uniform(-4.0, 4.0)
        pz = rng.uniform(-5.0, 5.0)
        s = rng.uniform(0.7, 1.1)
        ry = rng.uniform(-PI, PI)
        if scene.add_with_check_collisions(
            _dia(px, 0.0, pz, s, ry, math.radians(40.35)), root
        ):
            count += 1
    return scene


@register("rtcamp6_v1")
def rtcamp6_v1() -> SceneDesc:
    """main.rs:725-801."""
    r = 0.6
    return SceneDesc(
        name="rtcamp6_v1",
        camera=CameraDesc(
            eye=(0.0, 2.0, 10.0), target=(0.0, 1.0, 0.0), v_fov=10.0,
            lens_shape="circle", aperture=0.0, focus_distance=8.8,
        ),
        elements=[
            SphereDesc((0.0, 3.1782 * 0.4, 0.0), r, MaterialDesc(
                DIFFUSE, 0.0, T.white(), T.gray(10.0), T.gray(0.05))),
            MeshDesc(
                path="models/houdini_boss.obj",
                matrix=M.scale_linear(0.4) @ M.translate(0.0, 3.1782, 2.0) @ M.rotate_y(-0.5),
                material=MaterialDesc(REFRACTION, 1.5, T.const(0.7, 0.7, 1.0), T.black(), T.gray(0.1)),
            ),
            _floor(DIFFUSE, 0.0, T.image(_CHECKER_ALBEDO), T.image(_CHECKER_ROUGH)),
        ],
        skybox=_skybox("LancellottiChapel", intensity=(0.5, 0.5, 0.5)),
    )


@register("rtcamp6_v2")
def rtcamp6_v2() -> SceneDesc:
    """main.rs:804-925 — 100 floating spheres + fractal dodecahedron."""
    rng = StdRng([870, 2000, 304, 2])   # main.rs:805
    scene = SceneDesc(
        name="rtcamp6_v2",
        camera=CameraDesc(
            eye=(-5.0, -1.0, 0.0), target=(0.0, 0.0, 0.0), v_fov=10.0,
            lens_shape="circle", aperture=0.0, focus_distance=8.8,
        ),
        elements=[],
        skybox=_skybox("Ryfjallet", intensity=(0.5, 0.5, 0.5)),
    )
    root = asset_root()
    count = 0
    while count < 100:
        px = rng.uniform(-0.5, 2.0)
        py = rng.uniform(-2.0, 2.0)
        pz = rng.uniform(-2.0, 2.0)
        if scene.add_with_check_collisions(
            SphereDesc((px, py, pz), 0.1, MaterialDesc(
                GGX, 0.9, T.const(*_hsv(rng.uniform(0.0, 1.0), 1.0, 1.0)),
                T.black(), T.gray(rng.uniform(0.0, 1.0)))),
            root,
        ):
            count += 1
    count = 0
    while count < 5:
        px = rng.uniform(-0.2, 0.5)
        py = rng.uniform(-1.0, 1.0)
        pz = rng.uniform(-1.0, 1.0)
        e = _hsv(rng.uniform(0.0, 1.0), 1.0, 1.0)
        if scene.add_with_check_collisions(
            SphereDesc((px, py, pz), 0.1, MaterialDesc(
                DIFFUSE, 0.0, T.black(),
                T.const(e[0] * 10.0, e[1] * 10.0, e[2] * 10.0),
                T.gray(rng.uniform(0.0, 1.0)))),
            root,
        ):
            count += 1
    scene.add(
        MeshDesc(
            path="models/fractal_dodecahedron.obj",
            matrix=M.scale_linear(1.0),
            material=MaterialDesc(REFRACTION, 1.5, T.const(0.7, 0.7, 1.0), T.black(), T.gray(0.1)),
        )
    )
    return scene


@register("rtcamp6_v3")
def rtcamp6_v3() -> SceneDesc:
    """main.rs:928-1017."""
    r = 0.2
    eye = (0.0, 2.0, 6.0)
    target = (0.0, 1.0, 0.0)
    fwd = np.asarray(target) - np.asarray(eye)
    fwd /= np.linalg.norm(fwd)
    cam_light = tuple(np.asarray(eye) - fwd)
    return SceneDesc(
        name="rtcamp6_v3",
        camera=CameraDesc(
            eye=eye, target=target, v_fov=20.0,
            lens_shape="circle", aperture=0.2, focus_distance=4.9,
        ),
        elements=[
            SphereDesc((-0.3, 0.5 + r, 0.0), r, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.gray(10.0), T.black())),
            SphereDesc(cam_light, 0.001, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.gray(1000.0), T.black())),
            MeshDesc(
                path="models/bunny/bunny_wired_300.obj",
                matrix=M.scale_linear(1.5) @ M.rotate_y(0.3),
                material=MaterialDesc(GGX, 0.8, T.const(1.0, 0.01, 0.01), T.black(), T.gray(0.05)),
            ),
            _floor(DIFFUSE, 0.0, T.white(), T.white()),
        ],
        skybox=_skybox("Powerlines"),
    )


@register("rtcamp6_v3_1")
def rtcamp6_v3_1() -> SceneDesc:
    """main.rs:1020-1153 — the active default scene (main.rs:1273):
    emissive sphere, wired GGX bunny, mirror box + picture frame,
    magic-circle floor, 6 armadillos alternating Refraction/GGX,
    Powerlines skybox."""
    ss = 1.0  # scene_scale
    theta = PI2 * 0.03
    r_cam = 6.5 * ss
    radius = 0.2
    floor_s = 9.0 * ss
    scene = SceneDesc(
        name="rtcamp6_v3_1",
        camera=CameraDesc(
            eye=(r_cam * math.sin(theta), 2.0 * ss, r_cam * math.cos(theta)),
            target=(0.0, 1.0 * ss, 0.0),
            v_fov=20.0,
            lens_shape="circle",
            aperture=0.03,
            focus_distance=5.0 * ss,
        ),
        elements=[
            SphereDesc((-0.3 * ss, (0.5 + radius) * ss, 0.0), radius * ss,
                       MaterialDesc(DIFFUSE, 0.0, T.black(), T.const(30.0, 20.0, 4.0), T.black())),
            MeshDesc(
                path="models/bunny/bunny_wired_300.obj",
                matrix=M.scale_linear(1.5 * ss) @ M.rotate_y(0.3),
                material=MaterialDesc(GGX, 0.8, T.const(1.0, 0.01, 0.01), T.black(), T.gray(0.05)),
            ),
            # mirror (box.obj scaled flat)
            MeshDesc(
                path="models/box.obj",
                matrix=M.translate(1.0 * ss, 0.0, -3.0 * ss) @ M.rotate_y(-PI / 8.0)
                @ M.scale(4.0 * 0.9 * ss, 3.0 * 0.9 * ss, 0.1 * 0.9 * ss),
                material=MaterialDesc(SPECULAR, 0.0, T.white(), T.black(), T.black()),
            ),
            MeshDesc(
                path="models/picture_frame.obj",
                matrix=M.translate(1.0 * ss, 0.0, -3.0 * ss) @ M.rotate_y(-PI / 8.0)
                @ M.scale(4.0 * ss, 3.0 * ss, ss),
                material=MaterialDesc(GGX, 0.9, T.const(0.33, 0.27, 0.22), T.black(), T.gray(0.3)),
            ),
            CuboidDesc(
                aabb_min=(-floor_s, -1.0, -floor_s),
                aabb_max=(floor_s, 0.0, floor_s),
                material=MaterialDesc(
                    DIFFUSE, 0.0, T.image("textures/2d/magic-circle3.png"),
                    T.black(), T.white()),
            ),
        ],
        skybox=_skybox("Powerlines"),
    )
    count = 6
    for i in range(count):
        r = 2.2 * ss
        dr = i / count
        th = PI2 * dr
        px, pz = r * math.sin(th), r * math.cos(th)
        offset = 0.45
        hue = (offset + dr) % 1.0
        if i % 2 == 0:
            mat = MaterialDesc(REFRACTION, 1.5, T.const(*_hsv(hue, 0.2, 1.0)), T.black(), T.gray(0.1))
        else:
            mat = MaterialDesc(GGX, 0.8, T.const(*_hsv(hue, 1.0, 1.0)), T.black(), T.gray(0.05 * i))
        scene.add(
            MeshDesc(
                path="models/armadilo_1000.obj",
                matrix=M.translate(px, 0.0, pz) @ M.rotate_y(th) @ M.scale_linear(ss),
                material=mat,
            )
        )
    return scene


@register("rtcamp6_v4")
def rtcamp6_v4() -> SceneDesc:
    """main.rs:1156-1212.  NOTE: references models/fractal_icosahedron.obj
    which is absent from the reference asset tree — loading raises, exactly
    as the reference binary would panic."""
    eye = (0.0, 1.0, 6.0)
    target = (0.0, 0.0, 0.0)
    fwd = np.asarray(target) - np.asarray(eye)
    fwd /= np.linalg.norm(fwd)
    cam_light = tuple(np.asarray(eye) - fwd)
    return SceneDesc(
        name="rtcamp6_v4",
        camera=CameraDesc(
            eye=eye, target=target, v_fov=30.0,
            lens_shape="circle", aperture=0.0, focus_distance=4.9,
        ),
        elements=[
            MeshDesc(
                path="models/fractal_icosahedron.obj",
                matrix=M.scale_linear(1.0) @ M.rotate_y(0.3),
                material=MaterialDesc(GGX, 0.8, T.white(), T.black(), T.gray(0.05)),
            ),
            SphereDesc(cam_light, 0.001, MaterialDesc(
                DIFFUSE, 0.0, T.black(), T.gray(1000.0), T.black())),
        ],
        skybox=_skybox("Ryfjallet"),
    )
