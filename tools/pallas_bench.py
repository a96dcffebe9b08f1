#!/usr/bin/env python
"""Benchmark the Pallas tile-uniform BVH traversal vs the XLA lockstep walk
on the real chip, across ray-coherence classes.

Ray classes (the dispatch policy decides per class which path to use):
  primary  — camera rays of one 1080p pass: maximally coherent tiles
  shadow   — hit points toward the emissive sphere: converging, coherent
  bounce   — random hemisphere directions from random scene points:
             maximally incoherent, the worst case for tile-uniform descent

Prints one human-readable table plus one machine-readable JSON line per
(class, path) cell.  Safe on the serialized TPU relay: only scalar
checksums are fetched device→host.

Usage: python tools/pallas_bench.py [--platform cpu] [--res 1920 1080]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--res", nargs=2, type=int, default=[1920, 1080])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.config import INF
    from hanamaru_tpu.ops.intersect import Hit, _traverse_bvh, KIND_TRIANGLE
    from hanamaru_tpu.ops.traverse_pallas import TILE, traverse_scene_pallas
    from hanamaru_tpu.ops.camera import normalized_coords, ray_with_dof
    from hanamaru_tpu.scene.compile import compile_scene
    from hanamaru_tpu.utils.vec import Vec2, Vec3

    W, H = args.res
    n = W * H
    n -= n % TILE  # both paths get identical TILE-aligned batches

    desc = models.build(models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())
    s = jax.tree.map(jnp.asarray, cs.arrays)
    print(f"# scene {models.DEFAULT_SCENE}: {cs.arrays.tri_v0x.shape[0]} tris, "
          f"{cs.arrays.bvh_hit.shape[0]} nodes, {n} rays", file=sys.stderr)

    key = jax.random.PRNGKey(0)

    # --- primary rays: one supersample offset of the real camera ----------
    cam = jax.tree.map(jnp.asarray, cs.camera)
    nc = normalized_coords(W, H, 1)
    ku1, ku2 = jax.random.split(key)
    o_pri, d_pri = ray_with_dof(
        cam, Vec2(nc.x[:n], nc.y[:n]),
        jax.random.uniform(ku1, (n,)), jax.random.uniform(ku2, (n,)),
    )

    # --- incoherent bounce-like rays: random origins in the scene AABB,
    # random sphere directions (bounce-3+ regime) --------------------------
    kb1, kb2, kb3 = jax.random.split(key, 3)
    lo = jnp.array([float(cs.arrays.bvh_min_x[0]),
                    float(cs.arrays.bvh_min_y[0]),
                    float(cs.arrays.bvh_min_z[0])])
    hi = jnp.array([float(cs.arrays.bvh_max_x[0]),
                    float(cs.arrays.bvh_max_y[0]),
                    float(cs.arrays.bvh_max_z[0])])
    po = jax.random.uniform(kb1, (n, 3)) * (hi - lo) + lo
    dirs = jax.random.normal(kb2, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    o_bnc = Vec3(po[:, 0], po[:, 1], po[:, 2])
    d_bnc = Vec3(dirs[:, 0], dirs[:, 1], dirs[:, 2])

    # --- shadow-like rays: primary hit points toward the light sphere -----
    if cs.arrays.lt_sph.shape[0]:
        li = int(cs.arrays.lt_sph[0])
        lt = jnp.array([float(cs.arrays.sph_cx[li]),
                        float(cs.arrays.sph_cy[li]),
                        float(cs.arrays.sph_cz[li])])
    else:
        lt = jnp.array([0.0, 5.0, 0.0])
    # approximate hit points: advance primary rays a fixed distance
    adv = 8.0
    hp = Vec3(o_pri.x + d_pri.x * adv, o_pri.y + d_pri.y * adv,
              o_pri.z + d_pri.z * adv)
    sd = Vec3(lt[0] - hp.x, lt[1] - hp.y, lt[2] - hp.z)
    sl = jnp.sqrt(sd.x**2 + sd.y**2 + sd.z**2)
    d_shd = Vec3(sd.x / sl, sd.y / sl, sd.z / sl)
    o_shd = hp

    # NOTE: the scene is an *argument*, never a closure constant — large
    # constants embedded in the HLO stall this environment's remote
    # TPU compile service.
    @jax.jit
    def xla_walk_s(s, o, d):
        t0 = jnp.full((n,), INF, jnp.float32)
        kind = jnp.zeros((n,), jnp.int32)
        idx = jnp.zeros((n,), jnp.int32)
        h = _traverse_bvh(s, o, d, Hit(t0, kind, idx))
        idx = jnp.where(h.kind == KIND_TRIANGLE, h.idx, -1)
        return jnp.where(idx >= 0, h.t, 0.0), idx

    @jax.jit
    def pallas_walk_s(s, o, d):
        t0 = jnp.full((n,), INF, jnp.float32)
        t, idx = traverse_scene_pallas(s, o, d, t0)
        return jnp.where(idx >= 0, t, 0.0), idx

    xla_walk = lambda o, d: xla_walk_s(s, o, d)
    pallas_walk = lambda o, d: pallas_walk_s(s, o, d)

    classes = [("primary", o_pri, d_pri), ("shadow", o_shd, d_shd),
               ("bounce", o_bnc, d_bnc)]
    paths = [("xla", xla_walk), ("pallas", pallas_walk)]

    results = {}
    checks = {}
    for cname, o, d in classes:
        for pname, fn in paths:
            try:
                t, idx = fn(o, d)
                t = jnp.where(jnp.isfinite(t), t, 0.0)
                jnp.sum(t).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    t, idx = fn(o, d)
                    chk = jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                chk.block_until_ready()
                dt = (time.perf_counter() - t0) / args.reps
                rate = n / dt
                results[(cname, pname)] = rate
                checks[(cname, pname)] = (
                    float(chk), int(jnp.sum(idx >= 0)))
                print(json.dumps({
                    "class": cname, "path": pname, "rays": n,
                    "secs": round(dt, 6), "rays_per_sec": rate,
                    "checksum_t": float(chk),
                    "hits": int(jnp.sum(idx >= 0)),
                }))
            except Exception as e:  # noqa: BLE001 — report and move on
                print(json.dumps({
                    "class": cname, "path": pname,
                    "error": f"{type(e).__name__}: {str(e)[:400]}",
                }))
                results[(cname, pname)] = None

    print("\n# class      xla G rays/s   pallas G rays/s   pallas/xla",
          file=sys.stderr)
    for cname, _, _ in classes:
        rx = results.get((cname, "xla"))
        rp = results.get((cname, "pallas"))
        ratio = (rp / rx) if (rx and rp) else float("nan")
        fmt = lambda r: f"{r/1e9:13.2f}" if r else "        FAIL"
        print(f"# {cname:<10} {fmt(rx)}   {fmt(rp)}   {ratio:10.2f}x",
              file=sys.stderr)
        cx, cp = checks.get((cname, "xla")), checks.get((cname, "pallas"))
        if cx and cp:
            dev = abs(cx[0] - cp[0]) / max(abs(cx[0]), 1.0)
            print(f"#   parity: checksum rel dev {dev:.2e}, "
                  f"hits {cx[1]} vs {cp[1]}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
