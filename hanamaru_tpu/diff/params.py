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

# Named parameter tiers (bench.py measures "mat" and "all"; the render
# CLI computes no gradients, so it takes no tier flag).  "mat" is the
# scalar tier — every per-material BSDF scalar plus the skybox intensity
# knob, i.e. the parameters inverse-rendering workflows actually fit
# (diff/inverse.py, docs/inverse/) — and excludes the texel arrays whose
# adjoints dominate backward cost (millions of scatter/segment-sum
# targets; docs/perf.md "backward anatomy").  "tex" adds the texture
# atlas + skybox texel grids; "all" is both (the full PARAM_FIELDS set).
TIER_FIELDS: dict[str, tuple[str, ...]] = {
    "mat": (
        "mat_param",
        "mat_albedo_r", "mat_albedo_g", "mat_albedo_b",
        "mat_emission_r", "mat_emission_g", "mat_emission_b",
        "mat_rough_r", "mat_rough_g", "mat_rough_b",
        "sky_intensity",
    ),
    "tex": (
        "tex_r", "tex_g", "tex_b",
        "sky_r", "sky_g", "sky_b",
        "sky_intensity",
    ),
    "all": PARAM_FIELDS,
}


def split(
    arrays: SceneArrays, light_geometry: bool = False, tier: str = "all"
) -> tuple[dict[str, Any], SceneArrays]:
    """Returns (params dict, full arrays).  The arrays keep their values;
    merge() overwrites the param fields.  With `light_geometry`, sphere
    centers/radii (= light geometry, see LIGHT_GEOM_FIELDS) join the
    differentiable set.  `tier` selects a named subset of PARAM_FIELDS
    (TIER_FIELDS); fields outside the tier stay in `arrays` and the
    backward pass never materializes their adjoints (XLA dead-code
    eliminates the whole chain)."""
    fields = TIER_FIELDS[tier] + (LIGHT_GEOM_FIELDS if light_geometry else ())
    params = {f: getattr(arrays, f) for f in fields}
    return params, arrays


def merge(params: dict[str, Any], arrays: SceneArrays) -> SceneArrays:
    return arrays._replace(**params)


# Physical domain of each differentiable field, as (lo, hi) clamp bounds
# (None = unbounded on that side).  Used by projected optimization
# (diff/inverse.py): a gradient step can leave the valid domain — e.g.
# negative roughness, where the GGX NDF (alpha = roughness,
# material.rs:250-255) is meaningless — and the renderer's forward pass
# would then happily produce garbage with garbage gradients.
_DOMAINS: dict[str, tuple[float | None, float | None]] = {
    "mat_albedo": (0.0, 1.0),        # reflectance tint, energy-conserving
    "mat_rough": (1e-3, 1.0),        # GGX alpha floor avoids a delta NDF
    "mat_emission": (0.0, None),
    "mat_param": (0.0, None),        # f0 or ior, both non-negative
    "tex": (0.0, None),              # linear-space texels
    "sky": (0.0, None),
    "sky_intensity": (0.0, None),
    "sph_radius": (1e-4, None),
}


def project(params: dict[str, Any]) -> dict[str, Any]:
    """Clamp every known field into its physical domain (longest-prefix
    match on the field name); unknown fields pass through untouched."""
    import jax.numpy as jnp

    out = {}
    for name, v in params.items():
        bounds = None
        best = -1
        for prefix, b in _DOMAINS.items():
            if name.startswith(prefix) and len(prefix) > best:
                bounds, best = b, len(prefix)
        if bounds is not None:
            lo, hi = bounds
            v = jnp.clip(v, lo, hi)
        out[name] = v
    return out
