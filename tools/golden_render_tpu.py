#!/usr/bin/env python
"""Converged golden render on the TPU with a relay-hardened fetch.

This environment's TPU relay degrades on device->host transfers after
long dispatch sessions (CLAUDE.md): a big fetch can hang, and a wedged
fetch poisons the next dispatch.  So this tool separates the phases:

  1. render N progressive passes at full res (dispatch-only, fast);
  2. quiesce, then fetch the HDR accumulator in small blocks with
     retries and inter-block pauses, saving to an .npz;
  3. finalize (tonemap/gamma/bilateral/quantize) runs in a SEPARATE
     CPU process from the .npz (tools/golden_finalize_cpu.py), so no
     post-render device program is ever needed.

Usage:
  python tools/golden_render_tpu.py --passes 1000 --out /tmp/golden_acc.npz
  python tools/golden_finalize_cpu.py /tmp/golden_acc.npz docs/golden/x.png
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slow_fetch(arr, block_bytes=1 << 19, pause=0.05, retries=3):
    """Row-blocked device->host copy with pauses and per-block retry."""
    import numpy as np

    h = arr.shape[0]
    if arr.ndim == 1:
        arr = arr.reshape(1, -1) if h > 1 else arr
    row_bytes = max(1, int(np.prod(arr.shape[1:]))) * arr.dtype.itemsize
    step = max(1, block_bytes // row_bytes)
    out = []
    for i in range(0, arr.shape[0], step):
        for attempt in range(retries):
            try:
                out.append(np.asarray(arr[i : i + step]))
                break
            except Exception as e:  # noqa: BLE001 — relay hiccup, retry
                print(f"# block {i} attempt {attempt} failed: {e}",
                      file=sys.stderr, flush=True)
                if attempt + 1 == retries:
                    raise
                time.sleep(60.0)
        time.sleep(pause)
    return np.concatenate(out, axis=0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=1000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/golden_acc.npz")
    ap.add_argument("--quiesce", type=float, default=30.0,
                    help="seconds to sit idle between last pass and fetch")
    args = ap.parse_args()

    import jax
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.progressive import ProgressiveRenderer
    from hanamaru_tpu.scene.compile import compile_scene

    class Q:
        def __call__(self, m):
            print("#", m, file=sys.stderr, flush=True)

        def close(self):
            pass

    cfg = RenderConfig(width=args.width, height=args.height,
                       sampling=args.passes, time_limit_sec=1e9,
                       report_interval_sec=1e9)
    desc = models.build(args.scene or models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())
    print("# scene compiled", flush=True)

    r = ProgressiveRenderer(cs, cfg, out_dir="/tmp/golden_wd", tee=Q(),
                            lens_shape=desc.camera.lens_shape)
    key = jax.random.PRNGKey(cfg.seed)
    t0 = time.monotonic()
    for p in range(args.passes):
        # same per-pass keying as ProgressiveRenderer.render (1-origin)
        r.acc = r._pass(r.arrays, r.acc, jax.random.fold_in(key, p + 1))
        if (p + 1) % 100 == 0:
            jax.block_until_ready(r.acc.x)
            print(f"# pass {p + 1}/{args.passes} "
                  f"({time.monotonic() - t0:.1f}s)", flush=True)
    jax.block_until_ready(r.acc.x)
    dt = time.monotonic() - t0
    rays = args.width * args.height * cfg.rays_per_pixel_per_pass * args.passes
    print(f"# render done: {dt:.1f}s, {rays / dt:.3e} primary rays/s", flush=True)

    time.sleep(args.quiesce)
    print("# fetching accumulator...", flush=True)
    acc = {}
    for name, a in (("acc_x", r.acc.x), ("acc_y", r.acc.y), ("acc_z", r.acc.z)):
        t1 = time.monotonic()
        acc[name] = slow_fetch(a)
        print(f"# {name} fetched in {time.monotonic() - t1:.1f}s", flush=True)
    np.savez(args.out + ".tmp.npz", sampled=args.passes, seed=cfg.seed,
             width=args.width, height=args.height, **acc)
    os.replace(args.out + ".tmp.npz", args.out)
    print(f"# saved {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
