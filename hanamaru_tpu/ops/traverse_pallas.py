"""Pallas TPU kernel: tile-uniform BVH traversal + triangle intersection.

The XLA fallback (ops/intersect.py) traverses with per-ray node pointers
and per-ray gathers.  This kernel uses the *tile-uniform* formulation
instead, which maps better onto the TPU's scalar/vector split:

- each grid program owns a tile of rays (8x128 lanes held in VMEM);
- ONE scalar node pointer per tile walks the threaded BVH (hit/miss
  links) in SMEM-style scalar control flow;
- node AABBs and leaf triangles are loaded with *scalar* dynamic indices
  (uniform across the tile) and broadcast — no per-lane gathers, which
  Mosaic lowers poorly;
- the tile descends into a subtree when ANY of its rays hits the node box
  (vector test + jnp.any reduction), so the walk length is the union of
  the rays' individual walks — near-optimal for coherent tiles (primary
  rays, sorted bounce rays).

Scene tables (BVH nodes + triangles) are small (hundreds of KB for the
reference scenes) and live fully in VMEM next to the compute.

This replaces the reference's per-ray recursive descent (reference:
src/bvh.rs:213-237, innermost hot path per SURVEY.md §3.1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh import LEAF_MAX

# ray tile: 8 sublanes x 128 lanes
TILE_ROWS = 8
TILE_COLS = 128
TILE = TILE_ROWS * TILE_COLS


def _traverse_kernel(
    # rays (blocked per tile)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    # threaded BVH (full, VMEM)
    bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z,
    hit_link, miss_link, first_ref, count_ref,
    # triangles (full, VMEM)
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
    # init t (closest hit so far from sphere/cuboid pass)
    t0_ref,
    # outputs
    t_out, idx_out,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_x = 1.0 / dx
    inv_y = 1.0 / dy
    inv_z = 1.0 / dz

    def body(carry):
        node, t, idx = carry
        # scalar node fetch, broadcast to the tile
        nmnx = bmin_x[node]
        nmny = bmin_y[node]
        nmnz = bmin_z[node]
        nmxx = bmax_x[node]
        nmxy = bmax_y[node]
        nmxz = bmax_z[node]

        t1 = (nmnx - ox) * inv_x
        t2 = (nmxx - ox) * inv_x
        t3 = (nmny - oy) * inv_y
        t4 = (nmxy - oy) * inv_y
        t5 = (nmnz - oz) * inv_z
        t6 = (nmxz - oz) * inv_z
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(t3, t4)),
            jnp.minimum(t5, t6),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(t3, t4)),
            jnp.maximum(t5, t6),
        )
        lane_hit = (tmin <= tmax) & (tmax >= 0.0) & (tmin <= t)
        any_hit = jnp.any(lane_hit)

        first = first_ref[node]
        count = count_ref[node]

        def leaf_tests(carry):
            t, idx = carry
            for j in range(LEAF_MAX):
                pid = jnp.minimum(first + j, v0x.shape[0] - 1)
                p0x = v0x[pid]
                p0y = v0y[pid]
                p0z = v0z[pid]
                a1x = e1x[pid]
                a1y = e1y[pid]
                a1z = e1z[pid]
                a2x = e2x[pid]
                a2y = e2y[pid]
                a2z = e2z[pid]
                # det(e1, e2, -d) expansion (bvh.rs:266-290 semantics)
                denom = -(
                    a1x * a2y * dz + a1y * a2z * dx + a1z * a2x * dy
                    - a1x * a2z * dy - a1y * a2x * dz - a1z * a2y * dx
                )
                degenerate = jnp.abs(denom) < 1e-12
                dinv = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, denom))
                wx = ox - p0x
                wy = oy - p0y
                wz = oz - p0z
                u = -(
                    wx * a2y * dz + wy * a2z * dx + wz * a2x * dy
                    - wx * a2z * dy - wy * a2x * dz - wz * a2y * dx
                ) * dinv
                v = -(
                    a1x * wy * dz + a1y * wz * dx + a1z * wx * dy
                    - a1x * wz * dy - a1y * wx * dz - a1z * wy * dx
                ) * dinv
                tj = (
                    a1x * a2y * wz + a1y * a2z * wx + a1z * a2x * wy
                    - a1x * a2z * wy - a1y * a2x * wz - a1z * a2y * wx
                ) * dinv
                ok = (
                    (~degenerate)
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (tj > 0.0)
                    & (j < count)
                    & (tj < t)
                )
                t = jnp.where(ok, tj, t)
                idx = jnp.where(ok, pid, idx)
            return t, idx

        is_leaf_hit = any_hit & (count > 0)
        t, idx = jax.lax.cond(is_leaf_hit, leaf_tests, lambda c: c, (t, idx))

        nxt = jnp.where(any_hit, hit_link[node], miss_link[node])
        return nxt, t, idx

    def cond(carry):
        node, _, _ = carry
        return node >= 0

    t_init = t0_ref[:]
    idx_init = jnp.full((TILE_ROWS, TILE_COLS), -1, jnp.int32)
    _, t, idx = jax.lax.while_loop(cond, body, (0, t_init, idx_init))
    t_out[:] = t
    idx_out[:] = idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def traverse_tiles(
    o_x, o_y, o_z, d_x, d_y, d_z, t0,
    bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z,
    hit_link, miss_link, first, count,
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
    interpret: bool = False,
):
    """Traverse the threaded BVH for a flat [N] ray batch (N % 1024 == 0).

    Returns (t, tri_idx): closest triangle distance (bounded above by the
    incoming t0) and its index, -1 if none beat t0."""
    n = o_x.shape[0]
    assert n % TILE == 0, f"ray count {n} must be a multiple of {TILE}"
    grid = (n // TILE,)

    def shape2(a):
        return a.reshape(-1, TILE_ROWS, TILE_COLS)

    ray_spec = pl.BlockSpec(
        (1, TILE_ROWS, TILE_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(*refs):
        # drop the leading block dim of the ray refs
        rays = [r.at[0] for r in refs[:6]]
        t0r = refs[6].at[0]
        scene = refs[7:26]
        outs = [r.at[0] for r in refs[26:]]
        _traverse_kernel(*rays, *scene, t0r, *outs)

    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=tuple([ray_spec] * 7 + [full] * 19),
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n // TILE, TILE_ROWS, TILE_COLS), o_x.dtype),
            jax.ShapeDtypeStruct((n // TILE, TILE_ROWS, TILE_COLS), jnp.int32),
        ),
        interpret=interpret,
    )(
        shape2(o_x), shape2(o_y), shape2(o_z),
        shape2(d_x), shape2(d_y), shape2(d_z), shape2(t0),
        bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z,
        hit_link, miss_link, first, count,
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
    )
    return t.reshape(n), idx.reshape(n)
