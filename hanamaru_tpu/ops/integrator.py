"""Wavefront path-tracing integrator.

The reference's per-pixel recursive radiance loop (reference:
src/renderer.rs:163-203) becomes a fixed-depth `lax.scan` over bounces of a
flat ray batch; terminated rays stay in their lanes behind an alive mask
by default, with opt-in stream compaction between bounces
(ops/compaction.py, cfg.compact_from_bounce; measurements in
docs/perf.md).  Next-event estimation mirrors
renderer.rs:269-296, including the *absence* of MIS: by default the BSDF
continuation still accumulates emission at the next vertex, reproducing the
reference's double-counted direct light (SURVEY.md §3.4) — disable with
direct_light_mode="nee_clamp".

Accumulation order per bounce matches renderer.rs:174-200 exactly:
NEE first (with the pre-update throughput), then emission (masked out when
the BSDF sample was invalid), then the throughput update, then termination.

RNG pairing: the reference draws ONE (f64,f64) pair per bounce and reuses
it for both the BSDF sample and every light's NEE surface sample
(renderer.rs:175,183).  `strict_reference_rng=True` reproduces that
coupling exactly (the k_bsdf pair is reused for NEE); the default draws a
fresh pair per purpose (k_bsdf / k_nee splits below) — same marginal
distributions (tests/test_integrator.py::test_strict_reference_rng_same_marginals),
slightly lower estimator correlation, and the idiomatic (statistically
safer) counter-based-RNG formulation, which is why it stays the default.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import INF, OFFSET, PI2
from ..scene.compile import CameraArrays, SceneArrays
from ..utils.vec import Vec2, Vec3, where3, zeros3_like
from . import bsdf
from .camera import ray_pinhole, ray_with_dof
from .intersect import Hit, KIND_NONE, intersect_scene, surface_attributes
from .texture import point_emission, point_material, sample_skybox


# ---------------------------------------------------------------------------
# hit records: pack/replay support for the host-chained backward pass
# ---------------------------------------------------------------------------
# The hit *search* is fully detached from autodiff (intersect_scene stops
# gradients on every input), so the backward pass can replay the forward
# chain's discrete hit decisions instead of re-walking the BVH.  A hit is
# (kind, idx); its detached distance is only ever read on miss lanes
# (surface_attributes uses the differentiable recomputed distance on hit
# lanes), so a record packs kind into the top bits of one i32 per ray and
# the replay reconstructs the miss distance from context.
_PACK_SHIFT = 28
_PACK_MASK = (1 << _PACK_SHIFT) - 1


def pack_hit(hit: Hit) -> jax.Array:
    """One i32 per ray: kind in bits 28+, prim index below (indices are
    bounded by the scene's primitive counts, far under 2^28)."""
    return (hit.kind << _PACK_SHIFT) | hit.idx


def unpack_hit(packed, t_miss) -> Hit:
    """Rebuild a Hit from its packed record.  `t_miss` is the (detached)
    distance misses carried in the original search — INF for primary
    rays, the t_max cap for shadow rays; hit lanes' stored distance is
    never read downstream and is reconstructed as 0."""
    kind = packed >> _PACK_SHIFT
    idx = packed & _PACK_MASK
    t = jnp.where(kind != KIND_NONE, jnp.zeros_like(t_miss), t_miss)
    return Hit(t, kind, idx)


def _uniform_pair(key, n, dtype, lane_ids=None, n_total=None):
    """Two independent [n] uniform streams.

    With `lane_ids`, lane j draws the value that *original* lane
    lane_ids[j] of an n_total-wide batch would draw — the invariant that
    makes stream compaction (ops/compaction.py) bit-identical to dead-lane
    masking: a ray's randoms follow it, not its current vector position.
    """
    k1, k2 = jax.random.split(key)
    if lane_ids is None:
        return (
            jax.random.uniform(k1, (n,), dtype),
            jax.random.uniform(k2, (n,), dtype),
        )
    return (
        jax.random.uniform(k1, (n_total,), dtype)[lane_ids],
        jax.random.uniform(k2, (n_total,), dtype)[lane_ids],
    )


def sample_light_surface(
    s: SceneArrays, light_index: int, u1, u2
) -> tuple[Vec3, Vec3, jax.Array]:
    """Uniform point on emissive sphere `light_index`
    (reference: scene.rs:92-101).  Returns (position, normal, pdf).

    Light center/radius are gathered from the sphere tables through the
    `lt_sph` index view, so gradients of the NEE term w.r.t. light
    position/radius flow to sph_* (the single source of truth; see
    diff/params.py LIGHT_GEOM_FIELDS)."""
    theta = PI2 * u1
    unit_z = 1.0 - 2.0 * u2
    a = jnp.sqrt(jnp.maximum(1.0 - unit_z * unit_z, 0.0))
    normal = Vec3(a * jnp.cos(theta), a * jnp.sin(theta), unit_z)
    si = s.lt_sph[light_index]
    center = Vec3(s.sph_cx[si], s.sph_cy[si], s.sph_cz[si])
    radius = s.sph_radius[si]
    position = center + normal * (radius + OFFSET)
    pdf = 1.0 / (4.0 * jnp.pi * radius * radius)
    return position, normal, pdf


def next_event_estimation(
    s: SceneArrays,
    origin: Vec3,
    view: Vec3,
    normal: Vec3,
    surface,
    param,
    roughness,
    albedo: Vec3,
    u1,
    u2,
    active=None,
    traversal: str = "xla",
    shadow_hits=None,
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
) -> tuple[Vec3, jax.Array]:
    """Direct light at `origin` from every emissive sphere
    (renderer.rs:269-296).  One sample per light, shared randoms across
    lights like the reference.  Returns (radiance, packed shadow-hit
    records [num_lights, N]).

    Shadow rays cap the BVH walk at the sampled light point (`t_max`): any
    hit beyond it lies farther from the light sample than the visibility
    tolerance, so pruning cannot change the result.  `active` lanes that
    are not NEE-eligible skip the walk entirely (their contribution is
    masked out by the caller anyway).

    `shadow_hits` (optional [num_lights, N] i32, a previous call's second
    return): replay those hit records instead of walking the BVH — the
    backward pass runs with no traversal at all (hit search is detached,
    so gradients are identical; see pack_hit)."""
    acc = zeros3_like(origin.x)
    num_lights = s.lt_sph.shape[0]
    recorded = []
    for li in range(num_lights):
        lpos, lnormal, pdf = sample_light_surface(s, li, u1, u2)
        shadow_vec = lpos - origin
        dist2 = shadow_vec.dot(shadow_vec)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
        shadow_dir = shadow_vec / dist

        # visibility tolerance is 4*OFFSET on |hit - lpos|, and lpos lies
        # exactly on the shadow ray, so hits at t >= dist + 8*OFFSET can
        # never pass the test — prune the walk there
        t_cap = dist + 8.0 * OFFSET
        if shadow_hits is None:
            hit = intersect_scene(
                s, origin, shadow_dir, active=active,
                t_max=t_cap, traversal=traversal,
            )
        else:
            hit = unpack_hit(
                shadow_hits[li], jax.lax.stop_gradient(t_cap)
            )
        recorded.append(pack_hit(hit))
        surf = surface_attributes(s, origin, shadow_dir, hit)
        # visibility: closest hit coincides with the sampled point
        # (renderer.rs:282, vector.rs:89-91 — tolerance 4*OFFSET)
        delta = surf.position - lpos
        visible = hit.mask & (delta.dot(delta) < (4.0 * OFFSET) ** 2)

        emission = point_emission(s, surf.mat_id, surf.uv,
                                  textured=tex_channels[1])
        dot_0 = jnp.abs(normal.dot(shadow_dir))
        dot_l = jnp.abs(lnormal.dot(shadow_dir))
        geom = dot_0 * dot_l / jnp.maximum(dist2, 1e-20)
        f = bsdf.evaluate(surface, param, roughness, view, normal, shadow_dir)
        w = jnp.where(visible, f * geom / pdf, 0.0)
        acc = acc + emission * w
    if recorded:
        rec = jnp.stack(recorded, axis=0)
    else:
        rec = jnp.zeros((0,) + origin.x.shape, jnp.int32)
    return acc * albedo, rec


class PathState(NamedTuple):
    o: Vec3
    d: Vec3
    acc: Vec3
    refl: Vec3
    alive: jax.Array


def init_path_state(o: Vec3, d: Vec3) -> PathState:
    n = o.x.shape[0]
    dtype = o.x.dtype
    return PathState(
        o=o,
        d=d,
        acc=zeros3_like(o.x),
        refl=Vec3(jnp.ones(n, dtype), jnp.ones(n, dtype), jnp.ones(n, dtype)),
        alive=jnp.ones(n, bool),
    )


def bounce_step(
    s: SceneArrays,
    state: PathState,
    key,
    bounce_idx,
    direct_light_mode: str = "reference",
    lane_ids=None,
    n_total: int | None = None,
    traversal: str = "xla",
    hits=None,
    want_hits: bool = False,
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
    strict_reference_rng: bool = False,
) -> PathState:
    """One path vertex for the whole ray batch: intersect, shade, NEE,
    accumulate, advance (renderer.rs:174-200 body).

    `bounce_idx` is a traced scalar so a single compilation serves every
    bounce — the progressive runtime calls this once per bounce from the
    host (small program, compiled once) while `trace` wraps it in a
    lax.scan for end-to-end autodiff.

    `lane_ids`/`n_total`: when the batch is a compacted prefix
    (ops/compaction.py), per-lane randoms are drawn as original lane
    `lane_ids[j]` of the `n_total`-wide batch so compaction does not
    change the image.

    `want_hits=True` additionally returns this bounce's packed hit
    records `(primary [N] i32, shadow [num_lights, N] i32)`; passing
    them back as `hits=` replays the (detached) hit decisions with no
    BVH walk — how the host-chained backward pass (diff/hostgrad.py)
    eliminates traversal from its VJP programs."""
    n = state.o.x.shape[0]
    dtype = state.o.x.dtype
    use_nee = s.lt_sph.shape[0] > 0
    kb = jax.random.fold_in(key, bounce_idx)
    k_bsdf, k_nee = jax.random.split(kb)
    u1, u2 = _uniform_pair(k_bsdf, n, dtype, lane_ids, n_total)

    if hits is None:
        hit = intersect_scene(
            s, state.o, state.d, active=state.alive, traversal=traversal
        )
    else:
        hit = unpack_hit(hits[0], jnp.full(n, INF, dtype))
    surf = surface_attributes(s, state.o, state.d, hit)
    pm = point_material(s, surf.mat_id, surf.uv, tex_channels=tex_channels)

    view = -state.d
    bs = bsdf.sample(
        pm.surface, pm.param, pm.roughness, surf.position, view, surf.normal,
        u1, u2,
    )

    live_hit = state.alive & hit.mask
    sample_ok = live_hit & bs.valid

    acc = state.acc
    shadow_rec = None
    if use_nee:
        nee_mask = sample_ok & bsdf.nee_available(pm.surface)
        if strict_reference_rng:
            # the reference's shared per-bounce pair (renderer.rs:175,183)
            n1, n2 = u1, u2
        else:
            n1, n2 = _uniform_pair(k_nee, n, dtype, lane_ids, n_total)
        nee, shadow_rec = next_event_estimation(
            s, bs.origin, view, surf.normal,
            pm.surface, pm.param, pm.roughness, pm.albedo, n1, n2,
            active=nee_mask, traversal=traversal,
            shadow_hits=None if hits is None else hits[1],
            tex_channels=tex_channels,
        )
        acc = acc + state.refl * nee * jnp.where(nee_mask, 1.0, 0.0)

    # emission of the hit surface, or skybox on miss (scene.rs:351);
    # an invalid BSDF sample breaks *before* the emission add
    # (renderer.rs:190-196)
    sky = sample_skybox(s, state.d)
    emission = where3(hit.mask, pm.emission, sky)
    emit_mask = state.alive & (~hit.mask | bs.valid)
    if direct_light_mode == "nee_clamp" and use_nee:
        # optional no-double-count mode: NEE-able surfaces don't also
        # collect emission through the BSDF path beyond the first vertex
        emit_mask = emit_mask & (
            (bounce_idx == 0) | ~(hit.mask & bsdf.nee_available(pm.surface))
        )
    acc = acc + state.refl * emission * jnp.where(emit_mask, 1.0, 0.0)

    refl = where3(
        sample_ok, state.refl * pm.albedo * bs.reflectance, state.refl
    )
    nonzero = (refl.x != 0.0) | (refl.y != 0.0) | (refl.z != 0.0)
    alive = sample_ok & nonzero

    o = where3(sample_ok, bs.origin, state.o)
    d = where3(sample_ok, bs.direction, state.d)
    out = PathState(o, d, acc, refl, alive)
    if not want_hits:
        return out
    if shadow_rec is None:
        shadow_rec = jnp.zeros((0, n), jnp.int32)
    return out, (pack_hit(hit), shadow_rec)


def trace(
    s: SceneArrays,
    o: Vec3,
    d: Vec3,
    key,
    num_bounces: int,
    direct_light_mode: str = "reference",
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
    strict_reference_rng: bool = False,
) -> Vec3:
    """Trace a batch of rays for `num_bounces` path vertices; returns
    accumulated radiance per ray.  lax.scan keeps the whole path in one
    differentiable graph (used by the gradient/training paths)."""

    def body(state, bounce_idx):
        return (
            bounce_step(s, state, key, bounce_idx, direct_light_mode,
                        tex_channels=tex_channels,
                        strict_reference_rng=strict_reference_rng),
            None,
        )

    final, _ = jax.lax.scan(body, init_path_state(o, d), jnp.arange(num_bounces))
    return final.acc


def render_pass(
    s: SceneArrays,
    cam: CameraArrays,
    nc: Vec2,
    key,
    num_bounces: int,
    lens_shape: str = "circle",
    direct_light_mode: str = "reference",
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
    strict_reference_rng: bool = False,
) -> Vec3:
    """One progressive pass: DoF primary rays for every (pixel, subsample)
    normalized coord, traced to radiance (renderer.rs:163-173)."""
    n = nc.x.shape[0]
    k_lens, k_path = jax.random.split(key)
    u1, u2 = _uniform_pair(k_lens, n, nc.x.dtype)
    o, d = ray_with_dof(cam, nc, u1, u2, lens_shape)
    return trace(s, o, d, k_path, num_bounces, direct_light_mode,
                 tex_channels=tex_channels,
                 strict_reference_rng=strict_reference_rng)


# ---------------------------------------------------------------------------
# debug renderer (reference: renderer.rs:101-146)
# ---------------------------------------------------------------------------
def debug_pass(
    s: SceneArrays, cam: CameraArrays, nc: Vec2, mode: str
) -> Vec3:
    """Single-sample debug shading: mode in
    {"shading", "normal", "depth", "focal_plane"}."""
    o, d = ray_pinhole(cam, nc)
    hit = intersect_scene(s, o, d)
    surf = surface_attributes(s, o, d, hit)
    pm = point_material(s, surf.mat_id, surf.uv)
    sky = sample_skybox(s, d)

    if mode == "shading":
        light_dir = Vec3(
            jnp.asarray(1.0, nc.x.dtype),
            jnp.asarray(2.0, nc.x.dtype),
            jnp.asarray(-1.0, nc.x.dtype),
        ).normalize()
        sh_o = surf.position + surf.normal * OFFSET
        zero = jnp.zeros_like(nc.x)
        ld = Vec3(zero + light_dir.x, zero + light_dir.y, zero + light_dir.z)
        sh_hit = intersect_scene(s, sh_o, ld)
        shadow = jnp.where(sh_hit.mask, 0.5, 1.0)
        diffuse = jnp.maximum(surf.normal.dot(ld), 0.0)
        color = pm.emission + pm.albedo * (diffuse * shadow)
    elif mode == "normal":
        color = surf.normal
    elif mode == "depth":
        color = Vec3(*([0.5 * hit.t / cam.focus_distance] * 3))
    elif mode == "focal_plane":
        fp = jnp.abs(hit.t - cam.focus_distance)
        color = Vec3(fp, fp, fp)
    else:
        raise ValueError(f"unknown debug mode {mode!r}")
    return where3(hit.mask, color, sky)
