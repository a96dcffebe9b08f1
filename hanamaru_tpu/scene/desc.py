"""Host-side scene description (data, not code).

The reference expresses scenes as Rust constructor code over trait objects
(reference: src/main.rs:54-1212).  Here a scene is plain data: a list of
element descriptions plus camera and skybox, which the scene compiler
(compile.py) lowers to structure-of-arrays device tables.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# surface type codes (device-side enum); order mirrors material.rs:8-15
DIFFUSE = 0
SPECULAR = 1
REFRACTION = 2
GGX = 3
GGX_REFRACTION = 4

SURFACE_NAMES = {
    DIFFUSE: "diffuse",
    SPECULAR: "specular",
    REFRACTION: "refraction",
    GGX: "ggx",
    GGX_REFRACTION: "ggx_refraction",
}

# NEE-able BSDFs (material.rs:42-51): Diffuse and GGX only.
NEE_SURFACES = (DIFFUSE, GGX)


@dataclasses.dataclass(frozen=True)
class TextureDesc:
    """Optional image x constant tint (reference: texture.rs:72-114)."""

    color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    path: Optional[str] = None

    @staticmethod
    def white() -> "TextureDesc":
        return TextureDesc((1.0, 1.0, 1.0))

    @staticmethod
    def black() -> "TextureDesc":
        return TextureDesc((0.0, 0.0, 0.0))

    @staticmethod
    def const(r: float, g: float, b: float) -> "TextureDesc":
        return TextureDesc((r, g, b))

    @staticmethod
    def gray(v: float) -> "TextureDesc":
        return TextureDesc((v, v, v))

    @staticmethod
    def image(path: str, color: tuple[float, float, float] = (1.0, 1.0, 1.0)) -> "TextureDesc":
        return TextureDesc(color, path)


@dataclasses.dataclass(frozen=True)
class MaterialDesc:
    surface: int = DIFFUSE
    # f0 for GGX, refractive index for (GGX)Refraction; unused otherwise
    param: float = 0.0
    albedo: TextureDesc = TextureDesc.white()
    emission: TextureDesc = TextureDesc.black()
    roughness: TextureDesc = TextureDesc.black()


@dataclasses.dataclass(frozen=True)
class SphereDesc:
    center: tuple[float, float, float]
    radius: float
    material: MaterialDesc

    def aabb(self) -> tuple[np.ndarray, np.ndarray]:
        c, r = np.asarray(self.center, np.float64), self.radius
        return c - r, c + r


@dataclasses.dataclass(frozen=True)
class PlaneDesc:
    """Infinite plane through `center` with `normal` (reference:
    scene.rs:105-144; unused by the stock scenes but part of the
    primitive set).  UV assumes a +Y normal like the reference."""

    center: tuple[float, float, float]
    normal: tuple[float, float, float]
    material: MaterialDesc

    def aabb(self) -> tuple[np.ndarray, np.ndarray]:
        # dummy AABB like the reference (scene.rs:132-137)
        return np.zeros(3), np.zeros(3)


@dataclasses.dataclass(frozen=True)
class CuboidDesc:
    aabb_min: tuple[float, float, float]
    aabb_max: tuple[float, float, float]
    material: MaterialDesc

    def aabb(self) -> tuple[np.ndarray, np.ndarray]:
        return (
            np.asarray(self.aabb_min, np.float64),
            np.asarray(self.aabb_max, np.float64),
        )


@dataclasses.dataclass(frozen=True)
class MeshDesc:
    """Triangle mesh, either from an OBJ path (with bake-in transform,
    loader.rs:31) or from explicit arrays."""

    material: MaterialDesc
    path: Optional[str] = None
    matrix: Optional[np.ndarray] = None
    vertices: Optional[np.ndarray] = None   # [V,3]
    faces: Optional[np.ndarray] = None      # [F,3] int

    def load(self, asset_root: str) -> tuple[np.ndarray, np.ndarray]:
        from ..utils.obj import load_obj
        import os

        if self.path is not None:
            return load_obj(os.path.join(asset_root, self.path), self.matrix)
        assert self.vertices is not None and self.faces is not None
        v = np.asarray(self.vertices, np.float64)
        if self.matrix is not None:
            from . import matrix as mat44

            v = mat44.transform_points(self.matrix, v)
        return v, np.asarray(self.faces, np.int32)

    def aabb_with(self, verts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return verts.min(axis=0), verts.max(axis=0)


ElementDesc = SphereDesc | PlaneDesc | CuboidDesc | MeshDesc


@dataclasses.dataclass(frozen=True)
class SkyboxDesc:
    """6-face cube map + intensity multiplier (reference: scene.rs:268-320)."""

    px: Optional[str] = None
    nx: Optional[str] = None
    py: Optional[str] = None
    ny: Optional[str] = None
    pz: Optional[str] = None
    nz: Optional[str] = None
    intensity: tuple[float, float, float] = (1.0, 1.0, 1.0)

    def paths(self) -> list[Optional[str]]:
        return [self.px, self.nx, self.py, self.ny, self.pz, self.nz]


@dataclasses.dataclass(frozen=True)
class CameraDesc:
    """Thin-lens camera parameters (reference: camera.rs:45-64)."""

    eye: tuple[float, float, float]
    target: tuple[float, float, float]
    y_up: tuple[float, float, float] = (0.0, 1.0, 0.0)
    v_fov: float = 20.0             # NOTE: reference takes tan(fov), not fov/2
    lens_shape: str = "circle"      # "square" | "circle"
    aperture: float = 0.0
    focus_distance: float = 5.0


@dataclasses.dataclass
class SceneDesc:
    camera: CameraDesc
    elements: list[ElementDesc]
    skybox: SkyboxDesc
    name: str = "scene"

    def add(self, e: ElementDesc) -> None:
        self.elements.append(e)

    def add_with_check_collisions(self, e: ElementDesc, asset_root: str = ".") -> bool:
        """AABB-overlap-rejected placement (reference: scene.rs:366-376)."""
        mn, mx = _element_aabb(e, asset_root)
        for other in self.elements:
            omn, omx = _element_aabb(other, asset_root)
            if _aabb_overlap(mn, mx, omn, omx):
                return False
        self.elements.append(e)
        return True


def _element_aabb(e: ElementDesc, asset_root: str) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(e, MeshDesc):
        v, _ = e.load(asset_root)
        return e.aabb_with(v)
    return e.aabb()


def _aabb_overlap(amn, amx, bmn, bmx) -> bool:
    # strict inequalities per reference (bvh.rs:14-18)
    return bool(np.all(amn < bmx) and np.all(amx > bmn))
