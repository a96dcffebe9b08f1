"""Pallas TPU kernel: tile-uniform BVH traversal + triangle intersection.

The XLA fallback (ops/intersect.py) traverses with per-ray node pointers
and per-ray gathers.  This kernel uses the *tile-uniform* formulation
instead, which maps directly onto the TPU's scalar/vector split:

- each grid program owns a tile of 8x128 = 1024 rays held in VMEM;
- ONE scalar node pointer per tile walks the threaded BVH; all per-node
  data (AABB floats, hit/miss links, leaf metadata) lives in **SMEM**, so
  the walk's fetches are plain scalar loads overlapped with vector work
  (Mosaic cannot lower per-lane dynamic VMEM gathers, and 1-D VMEM scalar
  loads require 1024-element alignment — SMEM has neither restriction);
- each leaf's triangles are packed into one 128-float **VMEM row**
  (LEAF_MAX * 9 floats), fetched with a single dynamic row load and
  broadcast to the tile via static lane extracts;
- the tile descends into a subtree when ANY of its rays hits the node box
  (vector slab test + jnp.any reduction), so the walk length is the union
  of the rays' individual walks — near-optimal for coherent tiles
  (primary rays, shadow rays toward a common light, sorted bounce rays),
  pessimal for fully incoherent ones (the dispatch policy in
  ops/intersect.py picks per ray-class; see docs/perf.md).

SMEM budget: 6 f32 + 4 i32 arrays of n_nodes = 40 B/node; the largest
reference scene (rtcamp6_v3_1, 15,361 nodes) needs 614 KB of the ~940 KB
available (measured).  The leaf table is n_leaves x 512 B in VMEM.

This replaces the reference's per-ray recursive descent (reference:
src/bvh.rs:213-237, innermost hot path per SURVEY.md §3.1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh import LEAF_MAX

# ray tile: 8 sublanes x 128 lanes
TILE_ROWS = 8
TILE_COLS = 128
TILE = TILE_ROWS * TILE_COLS

# per-leaf row layout: LEAF_MAX triangles x 9 floats (v0, e1, e2), padded
# to the 128-lane row width
_LEAF_STRIDE = 9


def pack_leaf_rows(
    first: np.ndarray, count: np.ndarray,
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Build (leaf_row [n_nodes] i32, rows [n_leaves,128] f32) from the
    flat BVH's leaf ranges and the leaf-ordered triangle arrays.

    Row j*9+k holds triangle j's (v0x,v0y,v0z,e1x,e1y,e1z,e2x,e2y,e2z)[k];
    unused slots keep zeros (their lanes are masked by `j < count`)."""
    n_nodes = first.shape[0]
    leaf_ids = np.nonzero(count > 0)[0]
    leaf_row = np.full((n_nodes,), -1, np.int32)
    leaf_row[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    rows = np.zeros((max(len(leaf_ids), 1), 128), np.float32)
    for r, n in enumerate(leaf_ids):
        f, c = int(first[n]), int(count[n])
        tri = np.stack(
            [v0[f : f + c, 0], v0[f : f + c, 1], v0[f : f + c, 2],
             e1[f : f + c, 0], e1[f : f + c, 1], e1[f : f + c, 2],
             e2[f : f + c, 0], e2[f : f + c, 1], e2[f : f + c, 2]],
            axis=1,
        )  # [c, 9]
        rows[r, : c * _LEAF_STRIDE] = tri.reshape(-1)
    return leaf_row, rows


def _traverse_kernel(
    # rays (blocked per tile, VMEM)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
    # threaded BVH (SMEM scalars)
    bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z,
    hit_link, miss_link, leaf_first, leaf_row, leaf_count,
    # leaf triangle rows (full, VMEM)
    leaf_tris,
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
        # scalar node fetch (SMEM), broadcast to the tile
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
        # conservative entry max(tmin,0) <= t: closest-hit pruning, same
        # justification as ops/intersect.py _slab_t_enter
        lane_hit = (tmin <= tmax) & (tmax >= 0.0) & (jnp.maximum(tmin, 0.0) <= t)
        any_hit = jnp.any(lane_hit)

        cnt = leaf_count[node]
        row_id = leaf_row[node]
        first = leaf_first[node]

        def leaf_tests(tc):
            t, idx = tc
            row = leaf_tris[jnp.maximum(row_id, 0), :]   # (128,) f32
            for j in range(LEAF_MAX):
                b = j * _LEAF_STRIDE
                p0x, p0y, p0z = row[b + 0], row[b + 1], row[b + 2]
                a1x, a1y, a1z = row[b + 3], row[b + 4], row[b + 5]
                a2x, a2y, a2z = row[b + 6], row[b + 7], row[b + 8]
                # det(e1, e2, -d) expansion (bvh.rs:266-290 semantics)
                denom = -(
                    a1x * a2y * dz + a1y * a2z * dx + a1z * a2x * dy
                    - a1x * a2z * dy - a1y * a2x * dz - a1z * a2y * dx
                )
                degenerate = jnp.abs(denom) < 1e-12
                dinv = jnp.where(
                    degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, denom)
                )
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
                    & (j < cnt)
                    & (tj < t)
                )
                t = jnp.where(ok, tj, t)
                idx = jnp.where(ok, first + j, idx)
            return t, idx

        is_leaf_hit = any_hit & (cnt > 0)
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
    hit_link, miss_link, leaf_first, leaf_row, leaf_count,
    leaf_tris,
    interpret: bool = False,
):
    """Traverse the threaded BVH for a flat [N] ray batch (N % 1024 == 0).

    Returns (t, tri_idx): closest triangle distance (bounded above by the
    incoming t0) and its index, -1 if none beat t0.  Lanes with t0 = -inf
    never descend and never hit (used for padding / dead lanes)."""
    n = o_x.shape[0]
    assert n % TILE == 0, f"ray count {n} must be a multiple of {TILE}"
    grid = (n // TILE,)

    def shape2(a):
        return a.reshape(-1, TILE_ROWS, TILE_COLS)

    ray_spec = pl.BlockSpec(
        (1, TILE_ROWS, TILE_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def kernel(*refs):
        # drop the leading block dim of the ray refs
        rays = [r.at[0] for r in refs[:7]]
        scene = refs[7:19]
        outs = [r.at[0] for r in refs[19:]]
        _traverse_kernel(*rays, *scene, *outs)

    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=tuple([ray_spec] * 7 + [smem] * 11 + [vmem_full]),
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
        hit_link, miss_link, leaf_first, leaf_row, leaf_count,
        leaf_tris,
    )
    return t.reshape(n), idx.reshape(n)


def traverse_scene_pallas(s, o, d, t0, active=None, interpret: bool = False):
    """intersect_scene-compatible wrapper: pads the batch to a TILE
    multiple, folds `active` into the initial t (dead lanes get -inf so
    they neither descend nor hit), runs the kernel, and unpads.

    `s` is a SceneArrays with the Pallas leaf tables (bvh_leaf_row /
    plf_rows) populated by compile_scene."""
    n = o.x.shape[0]
    if active is not None:
        t0 = jnp.where(active, t0, -jnp.inf)
    pad = (-n) % TILE
    if pad:
        padf = lambda a, v: jnp.concatenate(
            [a, jnp.full((pad,), v, a.dtype)]
        )
        args = [padf(c, 0.0) for c in (o.x, o.y, o.z)]
        args += [padf(c, 1.0) for c in (d.x, d.y, d.z)]
        args.append(padf(t0, -jnp.inf))
    else:
        args = [o.x, o.y, o.z, d.x, d.y, d.z, t0]
    t, idx = traverse_tiles(
        *args,
        s.bvh_min_x, s.bvh_min_y, s.bvh_min_z,
        s.bvh_max_x, s.bvh_max_y, s.bvh_max_z,
        s.bvh_hit, s.bvh_miss, s.bvh_first, s.bvh_leaf_row, s.bvh_count,
        s.plf_rows,
        interpret=interpret,
    )
    if pad:
        t, idx = t[:n], idx[:n]
    return t, idx
