#!/usr/bin/env python
"""Measure stream compaction vs dead-lane masking on the full 9-bounce
rtcamp6 pass (SURVEY.md §7.5 hard part (d); VERDICT r1 item 3).

Times ProgressiveRenderer._pass at 1080p for compact_from_bounce in
{off, 2, 3, 4} and reports per-bounce live fractions so the numbers are
interpretable.  One JSON line per configuration.

Usage: python tools/compact_bench.py [--platform cpu] [--res 1920 1080]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--res", nargs=2, type=int, default=[1920, 1080])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bounces", nargs="*", type=int, default=[None, 2, 3, 4],
                    help="compact_from_bounce values; first None = masking")
    ap.add_argument("--skip-telemetry", action="store_true",
                    help="skip the per-bounce live-fraction probe (9 scalar "
                    "device->host syncs — risky on a degraded TPU relay; "
                    "the fractions are resolution-independent and recorded "
                    "in docs/perf.md)")
    args = ap.parse_args()

    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.ops import compaction, integrator
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer

    from hanamaru_tpu.scene.compile import compile_scene

    W, H = args.res
    desc = models.build(models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())

    class _Quiet:
        def __call__(self, msg):
            print(f"# {msg}", file=sys.stderr)

        def close(self):
            pass

    base_cfg = RenderConfig(width=W, height=H, sampling=10**9,
                            time_limit_sec=1e9, report_interval_sec=1e9)

    if not args.skip_telemetry:
        # --- live-fraction telemetry (one masked pass, counting per bounce) ---
        r0 = ProgressiveRenderer(cs, base_cfg, out_dir="/tmp/cb", tee=_Quiet())
        key = jax.random.PRNGKey(base_cfg.seed)
        # warm up + measure live fractions with a hand-rolled chunk loop
        from hanamaru_tpu.ops.camera import normalized_coords, ray_with_dof

        n = W * H * base_cfg.rays_per_pixel_per_pass
        n = min(n, base_cfg.max_rays_per_chunk)
        nc = normalized_coords(W, H, base_cfg.supersampling)
        nc = jax.device_put(
            type(nc)(nc.x[:n], nc.y[:n])
        )
        arrays = r0.arrays

        @jax.jit
        def raygen(arrays, nc, key):
            k_lens, _ = jax.random.split(key)
            k1, k2 = jax.random.split(k_lens)
            u1 = jax.random.uniform(k1, (n,), nc.x.dtype)
            u2 = jax.random.uniform(k2, (n,), nc.x.dtype)
            o, d = ray_with_dof(cs.camera, nc, u1, u2, desc.camera.lens_shape)
            return integrator.init_path_state(o, d)

        @jax.jit
        def bounce(arrays, state, key, b):
            return integrator.bounce_step(arrays, state, key, b)

        st = raygen(arrays, nc, key)
        fracs = []
        for b in range(base_cfg.num_bounces):
            st = bounce(arrays, st, key, b)
            fracs.append(float(compaction.count_alive(st.alive)) / n)
        print(json.dumps({"live_fraction_after_bounce": [round(f, 4) for f in fracs]}))

    # --- timing per configuration ----------------------------------------
    for cb in args.bounces:
        cfg = dataclasses.replace(base_cfg, compact_from_bounce=cb)
        r = ProgressiveRenderer(cs, cfg, out_dir="/tmp/cb", tee=_Quiet())
        k = jax.random.PRNGKey(cfg.seed)
        # warmup (compiles all bucket shapes this config will use)
        for w in range(2):
            r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(k, w))
        jax.block_until_ready(r.acc.x)
        t0 = time.perf_counter()
        for p in range(args.reps):
            r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(k, 100 + p))
        jax.block_until_ready(r.acc.x)
        dt = (time.perf_counter() - t0) / args.reps
        rays = W * H * cfg.rays_per_pixel_per_pass
        print(json.dumps({
            "compact_from_bounce": cb,
            "pass_secs": round(dt, 6),
            "primary_rays_per_sec": rays / dt,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
