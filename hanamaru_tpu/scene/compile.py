"""Scene compiler: SceneDesc -> structure-of-arrays device tables.

This is the TPU-native replacement for the reference's init-time object
graph (Box<Intersectable> trees, per-mesh BVH + scene BVH,
reference: src/main.rs:1267-1277, src/scene.rs, src/bvh.rs).  Dynamic
dispatch becomes integer material/surface tables; meshes are flattened into
one global triangle array with a single threaded BVH; textures are decoded
once into a padded atlas so in-flight sampling is pure gathers.
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional

import numpy as np

from ..utils.vec import Vec3
from . import desc as D
from .bvh import LEAF_MAX, build_triangle_bvh, build_triangle_bvh_sah, octant_links

# A ray that should never hit anything still needs valid gather targets.
_FAR = 1e30


class CameraArrays(NamedTuple):
    """Thin-lens camera constants (reference: camera.rs:45-64)."""

    eye: Vec3                  # scalars
    forward: Vec3
    right: Vec3
    up: Vec3
    plane_half_right: Vec3     # premultiplied by tan(fov)*focus_distance
    plane_half_up: Vec3
    lens_radius: np.ndarray    # scalar
    focus_distance: np.ndarray # scalar


class SceneArrays(NamedTuple):
    """Everything the integrator needs, as flat arrays (a jax pytree)."""

    # spheres -------------------------------------------------------- [S]
    sph_cx: np.ndarray
    sph_cy: np.ndarray
    sph_cz: np.ndarray
    sph_radius: np.ndarray
    sph_mat: np.ndarray        # i32 material id

    # planes --------------------------------------------------------- [P]
    pln_cx: np.ndarray
    pln_cy: np.ndarray
    pln_cz: np.ndarray
    pln_nx: np.ndarray
    pln_ny: np.ndarray
    pln_nz: np.ndarray
    pln_mat: np.ndarray

    # cuboids -------------------------------------------------------- [C]
    box_min_x: np.ndarray
    box_min_y: np.ndarray
    box_min_z: np.ndarray
    box_max_x: np.ndarray
    box_max_y: np.ndarray
    box_max_z: np.ndarray
    box_mat: np.ndarray

    # triangles (all meshes, BVH leaf order) ------------------------- [T]
    tri_v0x: np.ndarray
    tri_v0y: np.ndarray
    tri_v0z: np.ndarray
    tri_e1x: np.ndarray
    tri_e1y: np.ndarray
    tri_e1z: np.ndarray
    tri_e2x: np.ndarray
    tri_e2y: np.ndarray
    tri_e2z: np.ndarray
    tri_mat: np.ndarray

    # threaded BVH over triangles ------------------------------------ [Nn]
    bvh_min_x: np.ndarray
    bvh_min_y: np.ndarray
    bvh_min_z: np.ndarray
    bvh_max_x: np.ndarray
    bvh_max_y: np.ndarray
    bvh_max_z: np.ndarray
    bvh_hit: np.ndarray        # i32 next-node-on-hit
    bvh_miss: np.ndarray       # i32 next-node-on-miss
    bvh_first: np.ndarray      # i32 leaf first prim (or -1)
    bvh_count: np.ndarray      # i32 leaf prim count (or 0)
    # per-direction-octant links, flattened [8*Nn]: front-to-back ordering
    # so closest-hit pruning bites (see scene/bvh.py octant_links)
    bvh_hit8: np.ndarray
    bvh_miss8: np.ndarray
    # Pallas tile-uniform traversal tables (ops/traverse_pallas.py):
    # leaf ordinal per node (-1 for inner) and packed per-leaf triangle
    # rows [n_leaves, 128] (LEAF_MAX x 9 floats each)
    bvh_leaf_row: np.ndarray
    plf_rows: np.ndarray

    # materials ------------------------------------------------------ [M]
    mat_surface: np.ndarray    # i32 surface code
    mat_param: np.ndarray      # f0 or refractive index
    mat_albedo_r: np.ndarray
    mat_albedo_g: np.ndarray
    mat_albedo_b: np.ndarray
    mat_albedo_tex: np.ndarray     # i32 atlas id or -1
    mat_emission_r: np.ndarray
    mat_emission_g: np.ndarray
    mat_emission_b: np.ndarray
    mat_emission_tex: np.ndarray
    mat_rough_r: np.ndarray
    mat_rough_g: np.ndarray
    mat_rough_b: np.ndarray
    mat_rough_tex: np.ndarray

    # texture atlas (gamma-space f32, padded); one plane per channel so
    # sampling is three flat gathers ---------------------------------- [A,H,W]
    tex_r: np.ndarray
    tex_g: np.ndarray
    tex_b: np.ndarray
    tex_w: np.ndarray          # i32 actual widths
    tex_h: np.ndarray          # i32 actual heights

    # skybox cube map (gamma-space f32, padded) ----------------------- [6,H,W]
    sky_r: np.ndarray
    sky_g: np.ndarray
    sky_b: np.ndarray
    sky_w: np.ndarray
    sky_h: np.ndarray
    sky_intensity: Vec3        # scalars

    # NEE light list: indices of emissive spheres into the sph_* tables
    # (scene.rs:356-358).  A *view*, not a copy: light center/radius are
    # gathered from sph_* inside the traced integrator, so optimizing
    # sphere geometry moves the light and its NEE term together, and
    # light-parameter gradients flow through one source of truth. -- [L]
    lt_sph: np.ndarray


@dataclasses.dataclass(frozen=True)
class CompiledScene:
    camera: CameraArrays
    arrays: SceneArrays
    bvh_depth: int
    name: str
    stats: dict

    # Static (albedo, emission, roughness) texture-usage flags, computed
    # at compile time while the tables are still host numpy (never a
    # device fetch).  Passed to the integrator (ops/texture.py
    # point_material) so scenes that never texture a channel compile
    # without that channel's atlas fetch — identical output, and it
    # prunes the fetch's uv->bilinear transpose from the backward pass.
    tex_channels: tuple[bool, bool, bool] = (True, True, True)


def texture_channel_flags(arrays: SceneArrays) -> tuple[bool, bool, bool]:
    return (
        bool((np.asarray(arrays.mat_albedo_tex) >= 0).any()),
        bool((np.asarray(arrays.mat_emission_tex) >= 0).any()),
        bool((np.asarray(arrays.mat_rough_tex) >= 0).any()),
    )


def compile_camera(c: D.CameraDesc, dtype=np.float32) -> CameraArrays:
    eye = np.asarray(c.eye, np.float64)
    target = np.asarray(c.target, np.float64)
    y_up = np.asarray(c.y_up, np.float64)
    y_up = y_up / np.linalg.norm(y_up)

    # NOTE: tan of the *full* fov value, reproducing camera.rs:48.
    plane_half_height = np.tan(np.radians(c.v_fov))
    forward = target - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, y_up)
    right /= np.linalg.norm(right)
    up = np.cross(right, forward)
    up /= np.linalg.norm(up)

    def v3(a) -> Vec3:
        return Vec3(dtype(a[0]), dtype(a[1]), dtype(a[2]))

    return CameraArrays(
        eye=v3(eye),
        forward=v3(forward),
        right=v3(right),
        up=v3(up),
        plane_half_right=v3(right * plane_half_height * c.focus_distance),
        plane_half_up=v3(up * plane_half_height * c.focus_distance),
        lens_radius=dtype(0.5 * c.aperture),
        focus_distance=dtype(c.focus_distance),
    )


def _load_image_gamma(path: str) -> np.ndarray:
    """Decode to [H,W,3] f32 in [0,1], gamma space (as stored).

    The reference bilinearly interpolates gamma-space texels and only then
    converts to linear (texture.rs:42-48), so the atlas keeps gamma values
    and the decode happens after interpolation at sample time.
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


class _Atlas:
    def __init__(self) -> None:
        self.paths: list[str] = []
        self.images: list[np.ndarray] = []

    def add(self, path: Optional[str], asset_root: str) -> int:
        if path is None:
            return -1
        full = path if os.path.isabs(path) else os.path.join(asset_root, path)
        if full in self.paths:
            return self.paths.index(full)
        self.paths.append(full)
        self.images.append(_load_image_gamma(full))
        return len(self.paths) - 1

    def pack(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        if not self.images:
            return (
                np.zeros((1, 1, 1, 3), np.float32),
                np.ones((1,), np.int32),
                np.ones((1,), np.int32),
            )
        hm = max(im.shape[0] for im in self.images)
        wm = max(im.shape[1] for im in self.images)
        data = np.zeros((len(self.images), hm, wm, 3), np.float32)
        ws, hs = [], []
        for i, im in enumerate(self.images):
            h, w, _ = im.shape
            data[i, :h, :w] = im
            ws.append(w)
            hs.append(h)
        return data, np.asarray(ws, np.int32), np.asarray(hs, np.int32)


def compile_scene(scene: D.SceneDesc, asset_root: str = ".", dtype=np.float32) -> CompiledScene:
    atlas = _Atlas()

    # -- materials: one per element --------------------------------------
    mats: list[D.MaterialDesc] = [e.material for e in scene.elements]
    m_surface = np.asarray([m.surface for m in mats], np.int32)
    m_param = np.asarray([m.param for m in mats], dtype)

    def channel(get):
        colors = np.asarray([get(m).color for m in mats], dtype).reshape(-1, 3)
        tex = np.asarray(
            [atlas.add(get(m).path, asset_root) for m in mats], np.int32
        )
        return colors, tex

    alb_c, alb_t = channel(lambda m: m.albedo)
    emi_c, emi_t = channel(lambda m: m.emission)
    rou_c, rou_t = channel(lambda m: m.roughness)

    # -- geometry ---------------------------------------------------------
    sph_c, sph_r, sph_m = [], [], []
    pln_c, pln_n, pln_m = [], [], []
    box_mn, box_mx, box_m = [], [], []
    tri_v0, tri_v1, tri_v2, tri_m = [], [], [], []
    num_meshes = 0
    for mid, e in enumerate(scene.elements):
        if isinstance(e, D.SphereDesc):
            sph_c.append(e.center)
            sph_r.append(e.radius)
            sph_m.append(mid)
        elif isinstance(e, D.PlaneDesc):
            pln_c.append(e.center)
            pln_n.append(e.normal)
            pln_m.append(mid)
        elif isinstance(e, D.CuboidDesc):
            box_mn.append(e.aabb_min)
            box_mx.append(e.aabb_max)
            box_m.append(mid)
        elif isinstance(e, D.MeshDesc):
            v, f = e.load(asset_root)
            tri_v0.append(v[f[:, 0]])
            tri_v1.append(v[f[:, 1]])
            tri_v2.append(v[f[:, 2]])
            tri_m.append(np.full((len(f),), mid, np.int32))
            num_meshes += 1
        else:
            raise TypeError(f"unknown element {type(e)}")

    sph_c = np.asarray(sph_c, np.float64).reshape(-1, 3)
    sph_r = np.asarray(sph_r, np.float64).reshape(-1)
    sph_m = np.asarray(sph_m, np.int32).reshape(-1)
    pln_c = np.asarray(pln_c, np.float64).reshape(-1, 3)
    pln_n = np.asarray(pln_n, np.float64).reshape(-1, 3)
    pln_m = np.asarray(pln_m, np.int32).reshape(-1)
    box_mn = np.asarray(box_mn, np.float64).reshape(-1, 3)
    box_mx = np.asarray(box_mx, np.float64).reshape(-1, 3)
    box_m = np.asarray(box_m, np.int32).reshape(-1)

    if tri_v0:
        v0 = np.concatenate(tri_v0)
        v1 = np.concatenate(tri_v1)
        v2 = np.concatenate(tri_v2)
        tm = np.concatenate(tri_m)
    else:
        # one degenerate far-away triangle so gathers stay valid
        v0 = np.full((1, 3), _FAR)
        v1 = np.full((1, 3), _FAR)
        v2 = np.full((1, 3), _FAR)
        tm = np.zeros((1,), np.int32)

    # Default build is binned SAH (fewer node visits per ray); set
    # HANAMARU_BVH=parity for the reference's median-split construction
    # (bvh.rs:107-153).  Hit results are identical either way — the tree
    # only decides traversal cost.
    if os.environ.get("HANAMARU_BVH", "sah") == "parity":
        bvh = build_triangle_bvh(v0, v1, v2)
    else:
        bvh = build_triangle_bvh_sah(v0, v1, v2)
    # The traversal unrolls leaf tests LEAF_MAX times; a tree (from any
    # builder, incl. the native library whose kLeafMax duplicates this
    # constant) with larger leaves would silently drop hits — fail loudly.
    assert int(bvh.count.max(initial=0)) <= LEAF_MAX, (
        f"BVH leaf size {int(bvh.count.max())} exceeds LEAF_MAX={LEAF_MAX}"
    )
    if len(bvh.order):
        v0, v1, v2, tm = v0[bvh.order], v1[bvh.order], v2[bvh.order], tm[bvh.order]
    hit8, miss8 = octant_links(bvh)
    from ..ops.traverse_pallas import pack_leaf_rows

    leaf_row, leaf_rows = pack_leaf_rows(
        bvh.first, bvh.count, v0, v1 - v0, v2 - v0
    )

    # -- skybox -----------------------------------------------------------
    sky_paths = scene.skybox.paths()
    if all(p is not None for p in sky_paths):
        faces = [
            _load_image_gamma(os.path.join(asset_root, p)) for p in sky_paths
        ]
        hm = max(f.shape[0] for f in faces)
        wm = max(f.shape[1] for f in faces)
        sky = np.zeros((6, hm, wm, 3), np.float32)
        sky_w, sky_h = [], []
        for i, f in enumerate(faces):
            h, w, _ = f.shape
            sky[i, :h, :w] = f
            sky_w.append(w)
            sky_h.append(h)
        sky_w = np.asarray(sky_w, np.int32)
        sky_h = np.asarray(sky_h, np.int32)
    else:
        sky = np.zeros((6, 1, 1, 3), np.float32)
        sky_w = np.ones((6,), np.int32)
        sky_h = np.ones((6,), np.int32)

    # -- NEE lights: spheres with nonzero emission tint (scene.rs:356-358)
    lt_idx = np.asarray(
        [
            i
            for i, (c, r, m) in enumerate(zip(sph_c, sph_r, sph_m))
            if np.any(emi_c[m] != 0.0)
        ],
        np.int32,
    )

    tex_data, tex_w, tex_h = atlas.pack()

    f = lambda a: np.asarray(a, dtype)
    arrays = SceneArrays(
        sph_cx=f(sph_c[:, 0]), sph_cy=f(sph_c[:, 1]), sph_cz=f(sph_c[:, 2]),
        sph_radius=f(sph_r), sph_mat=sph_m,
        pln_cx=f(pln_c[:, 0]), pln_cy=f(pln_c[:, 1]), pln_cz=f(pln_c[:, 2]),
        pln_nx=f(pln_n[:, 0]), pln_ny=f(pln_n[:, 1]), pln_nz=f(pln_n[:, 2]),
        pln_mat=pln_m,
        box_min_x=f(box_mn[:, 0]), box_min_y=f(box_mn[:, 1]), box_min_z=f(box_mn[:, 2]),
        box_max_x=f(box_mx[:, 0]), box_max_y=f(box_mx[:, 1]), box_max_z=f(box_mx[:, 2]),
        box_mat=box_m,
        tri_v0x=f(v0[:, 0]), tri_v0y=f(v0[:, 1]), tri_v0z=f(v0[:, 2]),
        tri_e1x=f(v1[:, 0] - v0[:, 0]), tri_e1y=f(v1[:, 1] - v0[:, 1]), tri_e1z=f(v1[:, 2] - v0[:, 2]),
        tri_e2x=f(v2[:, 0] - v0[:, 0]), tri_e2y=f(v2[:, 1] - v0[:, 1]), tri_e2z=f(v2[:, 2] - v0[:, 2]),
        tri_mat=tm,
        bvh_min_x=f(bvh.aabb_min[:, 0]), bvh_min_y=f(bvh.aabb_min[:, 1]), bvh_min_z=f(bvh.aabb_min[:, 2]),
        bvh_max_x=f(bvh.aabb_max[:, 0]), bvh_max_y=f(bvh.aabb_max[:, 1]), bvh_max_z=f(bvh.aabb_max[:, 2]),
        bvh_hit=bvh.hit_link, bvh_miss=bvh.miss_link,
        bvh_first=bvh.first, bvh_count=bvh.count,
        bvh_hit8=hit8.reshape(-1), bvh_miss8=miss8.reshape(-1),
        bvh_leaf_row=leaf_row, plf_rows=leaf_rows,
        mat_surface=m_surface, mat_param=m_param,
        mat_albedo_r=f(alb_c[:, 0]), mat_albedo_g=f(alb_c[:, 1]), mat_albedo_b=f(alb_c[:, 2]),
        mat_albedo_tex=alb_t,
        mat_emission_r=f(emi_c[:, 0]), mat_emission_g=f(emi_c[:, 1]), mat_emission_b=f(emi_c[:, 2]),
        mat_emission_tex=emi_t,
        mat_rough_r=f(rou_c[:, 0]), mat_rough_g=f(rou_c[:, 1]), mat_rough_b=f(rou_c[:, 2]),
        mat_rough_tex=rou_t,
        tex_r=np.ascontiguousarray(tex_data[..., 0]),
        tex_g=np.ascontiguousarray(tex_data[..., 1]),
        tex_b=np.ascontiguousarray(tex_data[..., 2]),
        tex_w=tex_w, tex_h=tex_h,
        sky_r=np.ascontiguousarray(sky[..., 0]),
        sky_g=np.ascontiguousarray(sky[..., 1]),
        sky_b=np.ascontiguousarray(sky[..., 2]),
        sky_w=sky_w, sky_h=sky_h,
        sky_intensity=Vec3(
            dtype(scene.skybox.intensity[0]),
            dtype(scene.skybox.intensity[1]),
            dtype(scene.skybox.intensity[2]),
        ),
        lt_sph=lt_idx,
    )

    stats = dict(
        num_spheres=len(sph_r),
        num_planes=len(pln_m),
        num_cuboids=len(box_m),
        num_triangles=len(tm),
        num_bvh_nodes=len(bvh.hit_link),
        bvh_depth=bvh.depth,
        num_materials=len(mats),
        num_textures=len(atlas.paths),
        num_lights=len(lt_idx),
        num_meshes=num_meshes,
    )
    return CompiledScene(
        camera=compile_camera(scene.camera, dtype),
        arrays=arrays,
        bvh_depth=bvh.depth,
        name=scene.name,
        stats=stats,
        tex_channels=texture_channel_flags(arrays),
    )
