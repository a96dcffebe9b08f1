#!/usr/bin/env python
"""Multi-device scaling-efficiency harness (BASELINE.md: >=0.8 efficiency
at N>=2 workers).

Measures per-pass wall time of the sharded render at mesh sizes 1..N and
reports parallel efficiency.  On a real pod slice this exercises ICI; in
this repo's CI it runs on the virtual CPU mesh (XLA_FLAGS
--xla_force_host_platform_device_count), which validates the sharding
program and the *trend*, not absolute ICI bandwidth.

Usage:  python tools/scaling_bench.py [--devices 8] [--rays 262144]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--bounces", type=int, default=9)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--cpu", action="store_true", help="force the virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from hanamaru_tpu import models
    from hanamaru_tpu.ops.camera import normalized_coords
    from hanamaru_tpu.parallel.mesh import make_mesh
    from hanamaru_tpu.parallel.render import render_pass_sharded
    from hanamaru_tpu.scene.compile import compile_scene

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)

    navail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= min(navail, args.devices)]
    # fixed total work: strong scaling over the ray axis
    side = int((args.rays / 4) ** 0.5)
    nc = normalized_coords(side, side, 2)

    results = {}
    for n in sizes:
        mesh = make_mesh(n)
        fn = jax.jit(
            lambda nc, key: render_pass_sharded(
                mesh, arrays, cs.camera, nc, key, args.bounces
            )
        )
        key = jax.random.PRNGKey(0)
        out = fn(nc, key)
        jax.block_until_ready(out.x)
        t0 = time.monotonic()
        for p in range(args.passes):
            out = fn(nc, jax.random.fold_in(key, p))
        jax.block_until_ready(out.x)
        dt = (time.monotonic() - t0) / args.passes
        results[n] = dt
        base = results[sizes[0]]
        eff = base / (dt * n / sizes[0])
        print(
            json.dumps(
                {
                    "devices": n,
                    "pass_sec": round(dt, 4),
                    "speedup": round(base / dt, 2),
                    "efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
