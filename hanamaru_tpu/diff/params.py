"""Differentiable scene parameters.

The renderer is differentiable end-to-end with respect to the continuous
scene inputs — material tints, BSDF parameters (f0 / ior), roughness,
emission, texture texels, skybox texels and intensity, and light
geometry.  Discrete structure (hit selection, BVH links, surface codes,
russian-roulette branches) is non-differentiable by construction: it only
enters through comparisons and integer gathers, so no stop_gradient
scaffolding is needed — the masks simply carry no tangents.

`split` extracts the differentiable leaves of a SceneArrays as a flat
dict; `merge` rebuilds the full table set.  jax.grad over the dict then
gives exactly the parameter gradients (BASELINE.json configs: pixel
gradients to material/texture/light parameters).
"""
from __future__ import annotations

from typing import Any

from ..scene.compile import SceneArrays

# Every float leaf a user might optimize.  Geometry of solid primitives
# (sphere centers, cuboid extents, triangle vertices) is visibility-shaping
# and therefore excluded by default: its true derivative includes boundary
# terms a forward-AD of this estimator does not capture.
PARAM_FIELDS: tuple[str, ...] = (
    "mat_param",
    "mat_albedo_r", "mat_albedo_g", "mat_albedo_b",
    "mat_emission_r", "mat_emission_g", "mat_emission_b",
    "mat_rough_r", "mat_rough_g", "mat_rough_b",
    "tex_r", "tex_g", "tex_b",
    "sky_r", "sky_g", "sky_b",
    "sky_intensity",
)

# Sphere geometry doubles as light geometry: the NEE light list is an index
# view into these tables (scene/compile.py lt_sph), so center/radius
# gradients flow through the *continuous* NEE pathway (sample position,
# 1/r^2 pdf, geometry term) and the differentiable hit-point
# reconstruction.  What autodiff does NOT capture is the visibility
# boundary term (silhouette shifts as the sphere moves) — hit selection is
# detached in intersect_scene.  Opt in via split(..., light_geometry=True)
# when that interior gradient is the quantity you want (e.g. moving a
# light to brighten a region it already illuminates).
LIGHT_GEOM_FIELDS: tuple[str, ...] = (
    "sph_cx", "sph_cy", "sph_cz", "sph_radius",
)


def split(
    arrays: SceneArrays, light_geometry: bool = False
) -> tuple[dict[str, Any], SceneArrays]:
    """Returns (params dict, full arrays).  The arrays keep their values;
    merge() overwrites the param fields.  With `light_geometry`, sphere
    centers/radii (= light geometry, see LIGHT_GEOM_FIELDS) join the
    differentiable set."""
    fields = PARAM_FIELDS + (LIGHT_GEOM_FIELDS if light_geometry else ())
    params = {f: getattr(arrays, f) for f in fields}
    return params, arrays


def merge(params: dict[str, Any], arrays: SceneArrays) -> SceneArrays:
    return arrays._replace(**params)
