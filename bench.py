#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric: primary rays/sec on the rtcamp6 default scene (rtcamp6_v3_1,
main.rs:1273) at 1920x1080 with the reference's sampling config (2x2
supersampling, 9-bounce paths, NEE, DoF, IBL) — the same workload as the
reference's contest render.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is the *derived* rate implied by its rtcamp6 submission —
1920*1080*1000 passes*4 spp in the 123 s regulation window
(= 6.74e7 primary rays/s; `rtcamp6_1000x4spp.png` + main.rs:1253-1256).
That almost certainly overstates the Rust CPU renderer, so vs_baseline
here is a lower bound on the true speedup.
"""
from __future__ import annotations

import json
import sys
import time

# reference-derived denominator (see module docstring)
BASELINE_PRIMARY_RAYS_PER_SEC = 1920 * 1080 * 1000 * 4 / 123.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.runtime.logio import Tee
    from hanamaru_tpu.scene.compile import compile_scene

    width, height = 1920, 1080
    warmup_passes = 2
    timed_passes = 8

    cfg = RenderConfig(
        width=width, height=height,
        sampling=warmup_passes + timed_passes,
        time_limit_sec=1e9, report_interval_sec=1e9,
    )
    desc = models.build(models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())

    class _Quiet:
        def __call__(self, msg):
            print(f"# {msg}", file=sys.stderr)

        def close(self):
            pass

    r = ProgressiveRenderer(cs, cfg, out_dir="/tmp/bench_out", tee=_Quiet())

    # warmup (compiles)
    key = jax.random.PRNGKey(cfg.seed)
    for p in range(warmup_passes):
        r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(key, p))
    jax.block_until_ready(r.acc.x)

    t0 = time.monotonic()
    for p in range(timed_passes):
        r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(key, 100 + p))
    jax.block_until_ready(r.acc.x)
    dt = time.monotonic() - t0

    rays_per_pass = width * height * cfg.rays_per_pixel_per_pass
    rays_per_sec = rays_per_pass * timed_passes / dt

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_sec_1080p_rtcamp6_fwd",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / BASELINE_PRIMARY_RAYS_PER_SEC,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
