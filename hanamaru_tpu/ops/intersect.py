"""Ray-scene intersection: batched primitive tests + stackless BVH traversal.

TPU-native replacement for the reference's recursive, trait-dispatched
intersection stack (reference: src/scene.rs:58-266, src/bvh.rs:213-290).
All tests are vectorized over a flat ray batch; the closest hit is tracked
as (t, prim_kind, prim_idx) and shading attributes are reconstructed
afterwards (deferred shading), so the traversal loop carries minimal state.

Primitive semantics match the reference exactly:
- sphere: near quadratic root only — rays starting inside a sphere never hit
  it (scene.rs:58-78 observed behavior);
- cuboid: slab test, distance = tmin if tmin>=0 else tmax, face id by
  eps-equality in the reference's priority order (scene.rs:152-183);
- triangle: double-sided determinant (Möller-Trumbore-style) test with
  geometric, unflipped normal (bvh.rs:266-290).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import INF
from ..scene.bvh import LEAF_MAX
from ..scene.compile import SceneArrays
from ..utils.scalars import equals_eps, modulo
from ..utils.vec import Vec2, Vec3, det3, where2, where3

# prim kinds
KIND_NONE = 0
KIND_SPHERE = 1
KIND_CUBOID = 2
KIND_TRIANGLE = 3
KIND_PLANE = 4


class Hit(NamedTuple):
    t: jax.Array          # [N] distance, INF on miss
    kind: jax.Array       # [N] i32 prim kind
    idx: jax.Array        # [N] i32 prim index within its kind

    @property
    def mask(self) -> jax.Array:
        return self.kind != KIND_NONE


def _sphere_t(center: Vec3, radius, o: Vec3, d: Vec3) -> jax.Array:
    """Near-root sphere distance; INF when miss (scene.rs:58-78)."""
    a = o - center
    b = a.dot(d)
    c = a.dot(a) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 1e-20))
    ok = (disc > 0.0) & (t > 0.0)
    return jnp.where(ok, t, INF)


def _slab_t(mn: Vec3, mx: Vec3, o: Vec3, inv_d: Vec3) -> tuple[jax.Array, jax.Array]:
    """AABB slab test; returns (hit, distance) per bvh.rs:20-39."""
    t1 = (mn.x - o.x) * inv_d.x
    t2 = (mx.x - o.x) * inv_d.x
    t3 = (mn.y - o.y) * inv_d.y
    t4 = (mx.y - o.y) * inv_d.y
    t5 = (mn.z - o.z) * inv_d.z
    t6 = (mx.z - o.z) * inv_d.z
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(t3, t4)), jnp.minimum(t5, t6)
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(t3, t4)), jnp.maximum(t5, t6)
    )
    hit = (tmin <= tmax) & (tmax >= 0.0)
    return hit, jnp.where(tmin >= 0.0, tmin, tmax)


def _slab_t_enter(
    mn: Vec3, mx: Vec3, o: Vec3, inv_d: Vec3
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Slab test that also returns the conservative entry distance
    max(tmin, 0) — a true lower bound on any hit inside the box, safe for
    closest-hit pruning (unlike the reference-semantics distance)."""
    t1 = (mn.x - o.x) * inv_d.x
    t2 = (mx.x - o.x) * inv_d.x
    t3 = (mn.y - o.y) * inv_d.y
    t4 = (mx.y - o.y) * inv_d.y
    t5 = (mn.z - o.z) * inv_d.z
    t6 = (mx.z - o.z) * inv_d.z
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(t3, t4)), jnp.minimum(t5, t6)
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(t3, t4)), jnp.maximum(t5, t6)
    )
    hit = (tmin <= tmax) & (tmax >= 0.0)
    return hit, jnp.where(tmin >= 0.0, tmin, tmax), jnp.maximum(tmin, 0.0)


def _triangle_t(
    v0: Vec3, e1: Vec3, e2: Vec3, o: Vec3, d: Vec3
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Double-sided determinant triangle test (bvh.rs:266-290).

    Returns (t, u, v); t = INF on miss."""
    ray_inv = -d
    denom = det3(e1, e2, ray_inv)
    # divide by a safe value, then mask: keeps the backward pass free of
    # inf * 0 = nan at denom == 0
    # reject |denom| < 1e-12 (not just == 0): keeps 1/denom^2 finite in f32
    # for the backward pass; forward-wise this only drops near-parallel rays
    degenerate = jnp.abs(denom) < 1e-12
    denom_safe = jnp.where(degenerate, 1.0, denom)
    denom_inv = jnp.where(degenerate, 0.0, 1.0 / denom_safe)
    dv = o - v0
    u = det3(dv, e2, ray_inv) * denom_inv
    v = det3(e1, dv, ray_inv) * denom_inv
    t = det3(e1, e2, dv) * denom_inv
    ok = (
        ~degenerate
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return jnp.where(ok, t, INF), u, v


def _gather_tri(s: SceneArrays, idx) -> tuple[Vec3, Vec3, Vec3]:
    return (
        Vec3(s.tri_v0x[idx], s.tri_v0y[idx], s.tri_v0z[idx]),
        Vec3(s.tri_e1x[idx], s.tri_e1y[idx], s.tri_e1z[idx]),
        Vec3(s.tri_e2x[idx], s.tri_e2y[idx], s.tri_e2z[idx]),
    )


class _TraverseState(NamedTuple):
    node: jax.Array
    t: jax.Array
    kind: jax.Array
    idx: jax.Array


def _traverse_bvh(
    s: SceneArrays, o: Vec3, d: Vec3, hit: Hit, active=None
) -> Hit:
    """Lockstep stackless traversal of the threaded BVH.

    Every live ray holds a node pointer; one loop iteration does the AABB
    test, (masked) leaf primitive tests, and advances the pointer along the
    hit/miss links.  This replaces the reference's per-ray recursion
    (bvh.rs:213-237) with a vector-machine loop: no stack, no divergence,
    only gathers.

    `active=False` lanes never enter the walk (node starts at -1): the loop
    runs only as long as the longest *live* ray, which matters in late
    bounces where most lanes are dead but would otherwise re-walk their
    final (often expensive, scene-missing) ray every remaining bounce.

    Links come from the per-direction-octant tables (scene/bvh.py
    octant_links): each ray walks the SAME tree front-to-back for its
    direction signs, so `t` shrinks early and the closest-hit pruning
    culls far subtrees.  The winning distance `t` is identical to the
    canonical-order walk; on exact-distance ties between coincident
    duplicate faces the strict `tj < t` comparison keeps the first-visited
    triangle, so hit.idx/kind may differ by ray octant there.
    """
    num_tris = s.tri_v0x.shape[0]
    num_nodes = s.bvh_hit.shape[0]
    inv_d = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    octant = (
        (d.x < 0).astype(jnp.int32)
        + 2 * (d.y < 0).astype(jnp.int32)
        + 4 * (d.z < 0).astype(jnp.int32)
    )
    link_base = octant * num_nodes

    def cond(st: _TraverseState):
        return jnp.any(st.node >= 0)

    def body(st: _TraverseState) -> _TraverseState:
        active = st.node >= 0
        n = jnp.maximum(st.node, 0)
        mn = Vec3(s.bvh_min_x[n], s.bvh_min_y[n], s.bvh_min_z[n])
        mx = Vec3(s.bvh_max_x[n], s.bvh_max_y[n], s.bvh_max_z[n])
        aabb_hit, _, aabb_enter = _slab_t_enter(mn, mx, o, inv_d)
        # closest-hit pruning (pure speedup; the reference has none,
        # bvh.rs:214 — results are identical).  Must use the ENTRY
        # distance max(tmin, 0): for rays starting inside the box the
        # reference-semantics distance (tmin-or-tmax) is the exit and
        # would prune nodes that still hide closer hits.
        aabb_hit = aabb_hit & (aabb_enter <= st.t)

        first = s.bvh_first[n]
        count = s.bvh_count[n]
        is_leaf = count > 0

        t, kind, idx = st.t, st.kind, st.idx
        do_prims = active & aabb_hit & is_leaf
        for j in range(LEAF_MAX):
            pid = jnp.clip(first + j, 0, num_tris - 1)
            v0, e1, e2 = _gather_tri(s, pid)
            tj, _, _ = _triangle_t(v0, e1, e2, o, d)
            closer = do_prims & (j < count) & (tj < t)
            t = jnp.where(closer, tj, t)
            kind = jnp.where(closer, KIND_TRIANGLE, kind)
            idx = jnp.where(closer, pid, idx)

        nxt = jnp.where(
            aabb_hit, s.bvh_hit8[link_base + n], s.bvh_miss8[link_base + n]
        )
        return _TraverseState(jnp.where(active, nxt, -1), t, kind, idx)

    zeros = jnp.zeros_like(hit.t, dtype=jnp.int32)
    if active is not None:
        zeros = jnp.where(active, zeros, -1)
    init = _TraverseState(zeros, hit.t, hit.kind, hit.idx)
    out = jax.lax.while_loop(cond, body, init)
    return Hit(out.t, out.kind, out.idx)


def intersect_scene(
    s: SceneArrays, o: Vec3, d: Vec3, active=None, t_max=None,
    traversal: str = "xla",
) -> Hit:
    """Closest hit over spheres + cuboids (brute force, few of them) and the
    global triangle BVH.

    The hit *search* is detached from autodiff (stop_gradient on all
    inputs): which primitive wins is discrete, and the traversal while_loop
    is not reverse-differentiable anyway.  `surface_attributes` recomputes
    the winner's distance differentiably, so gradients w.r.t. continuous
    inputs flow through the reconstructed hit point — the standard
    detached-visibility formulation for differentiable path tracing.

    `active` (optional [N] bool) skips the BVH walk for dead lanes — pure
    speedup, results for active lanes are unchanged.  `t_max` (optional [N])
    rejects hits at t >= t_max and lets the traversal prune nodes beyond it;
    shadow rays use it to cap the walk at the sampled light point.

    `traversal` picks the BVH walk: "xla" = per-ray lockstep while_loop
    (default; best for incoherent batches), "pallas" = the tile-uniform
    Mosaic kernel (ops/traverse_pallas.py; TPU only, best for coherent
    batches — measurements in docs/perf.md).  Both produce identical
    hits."""
    s = jax.lax.stop_gradient(s)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    n = o.x.shape
    if t_max is None:
        t = jnp.full(n, INF, o.x.dtype)
    else:
        t = jnp.broadcast_to(
            jax.lax.stop_gradient(t_max).astype(o.x.dtype), n
        )
    kind = jnp.zeros(n, jnp.int32)
    idx = jnp.zeros(n, jnp.int32)

    if s.sph_radius.shape[0]:

        def sph_body(i, carry):
            t, kind, idx = carry
            c = Vec3(s.sph_cx[i], s.sph_cy[i], s.sph_cz[i])
            ti = _sphere_t(c, s.sph_radius[i], o, d)
            closer = ti < t
            return (
                jnp.where(closer, ti, t),
                jnp.where(closer, KIND_SPHERE, kind),
                jnp.where(closer, i, idx),
            )

        t, kind, idx = jax.lax.fori_loop(
            0, s.sph_radius.shape[0], sph_body, (t, kind, idx)
        )

    if s.pln_mat.shape[0]:

        def pln_body(i, carry):
            t, kind, idx = carry
            n_p = Vec3(s.pln_nx[i], s.pln_ny[i], s.pln_nz[i])
            c_p = Vec3(s.pln_cx[i], s.pln_cy[i], s.pln_cz[i])
            # reference form (scene.rs:112-116): dd = -center.n;
            # t = -(o.n + dd) / (d.n)
            dd = -c_p.dot(n_p)
            v = d.dot(n_p)
            ti = -(o.dot(n_p) + dd) / jnp.where(v == 0.0, 1e-20, v)
            closer = (ti > 0.0) & (ti < t)
            return (
                jnp.where(closer, ti, t),
                jnp.where(closer, KIND_PLANE, kind),
                jnp.where(closer, i, idx),
            )

        t, kind, idx = jax.lax.fori_loop(
            0, s.pln_mat.shape[0], pln_body, (t, kind, idx)
        )

    if s.box_mat.shape[0]:

        def box_body(i, carry):
            t, kind, idx = carry
            mn = Vec3(s.box_min_x[i], s.box_min_y[i], s.box_min_z[i])
            mx = Vec3(s.box_max_x[i], s.box_max_y[i], s.box_max_z[i])
            inv_d = Vec3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
            hit_i, ti = _slab_t(mn, mx, o, inv_d)
            closer = hit_i & (ti > 0.0) & (ti < t)
            return (
                jnp.where(closer, ti, t),
                jnp.where(closer, KIND_CUBOID, kind),
                jnp.where(closer, i, idx),
            )

        t, kind, idx = jax.lax.fori_loop(
            0, s.box_mat.shape[0], box_body, (t, kind, idx)
        )

    if active is not None:
        active = jax.lax.stop_gradient(active)
    if traversal.startswith("pallas"):
        from .traverse_pallas import traverse_scene_pallas

        tt, ti = traverse_scene_pallas(
            s, o, d, t, active=active,
            interpret=traversal == "pallas_interpret",
        )
        won = ti >= 0
        return Hit(
            jnp.where(won, tt, t),
            jnp.where(won, KIND_TRIANGLE, kind),
            jnp.where(won, ti, idx),
        )
    return _traverse_bvh(s, o, d, Hit(t, kind, idx), active)


class Surface(NamedTuple):
    """Shading attributes at the closest hit (deferred reconstruction)."""

    position: Vec3
    normal: Vec3
    uv: Vec2
    mat_id: jax.Array     # i32; 0 where miss (callers gate on hit.mask)


def surface_attributes(s: SceneArrays, o: Vec3, d: Vec3, hit: Hit) -> Surface:
    """Recompute normal/uv/material of the winning primitive per ray.

    Doing this once after traversal (instead of inside every primitive test
    like the reference's shared &mut Intersection, scene.rs:58-78) keeps the
    hot loop lean; the reconstruction is a handful of gathers + flops.

    The winner's distance is *recomputed differentiably* here (the search in
    intersect_scene is detached), so position/normal/uv carry gradients
    w.r.t. ray origin/direction — which is how parameter gradients reach
    secondary vertices."""
    # --- triangle attributes (bvh.rs:285-289) — the triangle table is
    # always non-empty (compile pads a degenerate far-away triangle)
    ti = jnp.clip(hit.idx, 0, s.tri_v0x.shape[0] - 1)
    v0, e1, e2 = _gather_tri(s, ti)
    t_diff, tu, tv = _triangle_t(v0, e1, e2, o, d)
    normal = e1.cross(e2).normalize()
    uv = Vec2(tu, tv)
    mat_id = s.tri_mat[ti]

    # differentiable distance of the winning primitive per kind
    if s.sph_radius.shape[0]:
        si = jnp.clip(hit.idx, 0, s.sph_radius.shape[0] - 1)
        sc = Vec3(s.sph_cx[si], s.sph_cy[si], s.sph_cz[si])
        t_diff = jnp.where(
            hit.kind == KIND_SPHERE,
            _sphere_t(sc, s.sph_radius[si], o, d),
            t_diff,
        )
    if s.pln_mat.shape[0]:
        pi = jnp.clip(hit.idx, 0, s.pln_mat.shape[0] - 1)
        pn = Vec3(s.pln_nx[pi], s.pln_ny[pi], s.pln_nz[pi])
        pc = Vec3(s.pln_cx[pi], s.pln_cy[pi], s.pln_cz[pi])
        dd = -pc.dot(pn)
        v = d.dot(pn)
        t_pln = -(o.dot(pn) + dd) / jnp.where(v == 0.0, 1e-20, v)
        t_diff = jnp.where(hit.kind == KIND_PLANE, t_pln, t_diff)

    if s.box_mat.shape[0]:
        bi = jnp.clip(hit.idx, 0, s.box_mat.shape[0] - 1)
        bmn = Vec3(s.box_min_x[bi], s.box_min_y[bi], s.box_min_z[bi])
        bmx = Vec3(s.box_max_x[bi], s.box_max_y[bi], s.box_max_z[bi])
        # clamp direction components away from 0: an exactly axis-aligned
        # ray would otherwise produce inf intermediates whose gradient is nan
        safe_d = Vec3(
            *(jnp.where(jnp.abs(c) < 1e-12, 1e-12, c) for c in d)
        )
        inv_d = Vec3(1.0 / safe_d.x, 1.0 / safe_d.y, 1.0 / safe_d.z)
        _, t_box = _slab_t(bmn, bmx, o, inv_d)
        t_diff = jnp.where(hit.kind == KIND_CUBOID, t_box, t_diff)
    t_use = jnp.where(hit.mask, t_diff, hit.t)   # hit.t is detached INF on miss
    p = o + d * t_use

    if s.sph_radius.shape[0]:
        # --- sphere attributes (scene.rs:65-73)
        sn = (p - sc).normalize()
        # spherical uv; guard the pole where xz-length is 0.  Floors sized
        # so the backward pass (1/safe^2 etc.) stays finite in f32.
        xz_len = jnp.sqrt(jnp.maximum(sn.x * sn.x + sn.z * sn.z, 1e-12))
        safe = jnp.maximum(xz_len, 1e-6)
        # clip strictly inside (-1, 1): acos' derivative is infinite at the
        # poles and would turn masked-out cotangents into nan
        acos_in = lambda x: jnp.arccos(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))
        sphere_u = 0.5 - jnp.sign(sn.z) * acos_in(sn.x / safe) / (2.0 * jnp.pi)
        sphere_v = 1.0 - acos_in(sn.y) / jnp.pi
        is_s = hit.kind == KIND_SPHERE
        normal = where3(is_s, sn, normal)
        uv = where2(is_s, Vec2(sphere_u, sphere_v), uv)
        mat_id = jnp.where(is_s, s.sph_mat[si], mat_id)

    if s.box_mat.shape[0]:
        # --- cuboid attributes (scene.rs:157-178)
        uvw = (p - bmn) / (bmx - bmn)
        eq = equals_eps  # math.rs:21-23 face-id tolerance
        # priority chain: +y, -y, -x, +x, -z, then +z as the default
        conds = [
            eq(p.y, bmx.y),
            eq(p.y, bmn.y),
            eq(p.x, bmn.x),
            eq(p.x, bmx.x),
            eq(p.z, bmn.z),
        ]
        normals = [
            (0.0, 1.0, 0.0),
            (0.0, -1.0, 0.0),
            (-1.0, 0.0, 0.0),
            (1.0, 0.0, 0.0),
            (0.0, 0.0, -1.0),
        ]
        uvs = [
            Vec2(uvw.x, 1.0 - uvw.z),
            Vec2(uvw.x, 1.0 - uvw.z),
            Vec2(uvw.z, uvw.y),
            Vec2(uvw.z, uvw.y),
            Vec2(uvw.x, uvw.y),
        ]
        zero = jnp.zeros_like(p.x)
        bn = Vec3(zero, zero, zero + 1.0)        # default +z face
        buv = Vec2(uvw.x, uvw.y)
        for c, nrm, fuv in zip(reversed(conds), reversed(normals), reversed(uvs)):
            bn = where3(c, Vec3(zero + nrm[0], zero + nrm[1], zero + nrm[2]), bn)
            buv = where2(c, fuv, buv)
        is_b = hit.kind == KIND_CUBOID
        normal = where3(is_b, bn, normal)
        uv = where2(is_b, buv, uv)
        mat_id = jnp.where(is_b, s.box_mat[bi], mat_id)

    if s.pln_mat.shape[0]:
        # plane attributes (scene.rs:117-123): fixed normal, uv from the
        # positive modulo of world x/z (math.rs:4-7; assumes +Y normal)
        is_p = hit.kind == KIND_PLANE
        normal = where3(is_p, pn, normal)
        uv = where2(is_p, Vec2(modulo(p.x, 1.0), modulo(p.z, 1.0)), uv)
        mat_id = jnp.where(is_p, s.pln_mat[pi], mat_id)

    mat_id = jnp.where(hit.mask, mat_id, 0)
    return Surface(position=p, normal=normal, uv=uv, mat_id=mat_id)
