#!/usr/bin/env python
"""Converged golden render on the TPU, hardened for this relay.

Empirical relay behavior (2026-08-20 sessions, see docs/perf.md):
forward dispatches are fast and stable at any count, but a device->host
transfer issued after a LONG dispatch session can crash the TPU worker
process (1000-pass sessions crashed 2/2 at the first post-render fetch;
a 2-pass session fetched fine).  Hardening used here:

  * the finalize program AND the fetch path are compiled and exercised
    BEFORE the render loop (on the zero accumulator), so nothing
    compiles after the dispatch session;
  * fetches move the small u8 image (6 MB), not the f32 HDR accumulator
    (24 MB), in 1 MB row blocks;
  * artifacts are staged smallest-risk-first: a low-res render is
    fetched and saved before the full-res attempt, so a late worker
    crash cannot lose everything;
  * pass counts stay modest (128 x 4 spp is visually converged; the
    structural golden compare box-downscales anyway).

Usage:
  python tools/golden_render_tpu.py --out-dir docs/golden \
      [--stages 384x216x64 1920x1080x128]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="*", default=["384x216x64", "1920x1080x128"],
                    help="WxHxPASSES, attempted in order; each stage saves "
                    "its PNG before the next starts")
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--out-dir", type=str, default="/tmp/golden_out")
    ap.add_argument("--quiesce", type=float, default=10.0)
    args = ap.parse_args()

    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.logio import save_png
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer, fetch_image
    from hanamaru_tpu.scene.compile import compile_scene

    class Q:
        def __call__(self, m):
            print("#", m, file=sys.stderr, flush=True)

        def close(self):
            pass

    os.makedirs(args.out_dir, exist_ok=True)
    desc = models.build(args.scene or models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())
    print("# scene compiled", flush=True)

    for stage in args.stages:
        w, h, passes = (int(v) for v in stage.split("x"))
        cfg = RenderConfig(width=w, height=h, sampling=passes,
                           time_limit_sec=1e9, report_interval_sec=1e9)
        r = ProgressiveRenderer(cs, cfg, out_dir=args.out_dir, tee=Q(),
                                lens_shape=desc.camera.lens_shape)
        key = jax.random.PRNGKey(cfg.seed)

        # compile + PROVE the whole post-render path on the zero
        # accumulator before any bounce dispatch happens
        t0 = time.monotonic()
        warm = fetch_image(r._finalize(r.acc, 1))
        print(f"# [{stage}] finalize+fetch path proven "
              f"({time.monotonic() - t0:.1f}s, mean {warm.mean():.1f})",
              flush=True)

        t0 = time.monotonic()
        for p in range(passes):
            r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(key, p + 1))
            if (p + 1) % 32 == 0:
                jax.block_until_ready(r.acc.x)
        jax.block_until_ready(r.acc.x)
        dt = time.monotonic() - t0
        rays = w * h * cfg.rays_per_pixel_per_pass * passes
        print(f"# [{stage}] render {dt:.1f}s, {rays / dt:.3e} primary rays/s",
              flush=True)

        time.sleep(args.quiesce)
        # the finalize/fetch wall times double as a block_until_ready
        # honesty check: if the render loop's block returned before the
        # queued passes actually executed, the first data-dependent
        # observation here absorbs the remaining execution time
        # (docs/perf.md round-5 "measurement integrity")
        t0 = time.monotonic()
        img = r._finalize(r.acc, passes)
        jax.block_until_ready(img)
        print(f"# [{stage}] finalized ({time.monotonic() - t0:.1f}s); "
              "fetching...", flush=True)
        t0 = time.monotonic()
        out = fetch_image(img)
        print(f"# [{stage}] fetched ({time.monotonic() - t0:.1f}s)", flush=True)
        path = os.path.join(args.out_dir, f"rtcamp6_{w}x{h}_{passes}pass.png")
        save_png(path, out)
        print(f"# [{stage}] saved {path}", flush=True)
    print("ALL STAGES DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
