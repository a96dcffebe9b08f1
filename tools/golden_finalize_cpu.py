#!/usr/bin/env python
"""Finalize a fetched HDR accumulator checkpoint (.npz written by
ProgressiveRenderer.save_checkpoint — e.g. a `--checkpoint-interval`
render, whose npz carries acc_x/y/z, sampled, width, height) to a PNG on
the CPU backend — the post-processing half of the split golden pipeline
(the TPU relay here can't be trusted with post-render device programs +
big fetches; see tools/golden_render_tpu.py).

The finalize chain is the SAME jitted finalize_image as the on-device
path (ops/postprocess.py — tonemap/gamma/bilateral/quantize parity with
renderer.rs:64-90), just executed by the CPU backend.

Usage: python tools/golden_finalize_cpu.py <acc.npz> <out.png>
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    acc_path, out_png = sys.argv[1], sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hanamaru_tpu.config import RenderConfig
    from hanamaru_tpu.runtime.logio import save_png
    from hanamaru_tpu.runtime.progressive import _finalize_fn
    from hanamaru_tpu.utils.vec import Vec3

    d = np.load(acc_path)
    if "width" not in d or "height" not in d:
        raise SystemExit(
            f"{acc_path} lacks width/height keys: pre-round-3 checkpoints "
            "are not self-describing; re-save or pass a checkpoint written "
            "by the current ProgressiveRenderer.save_checkpoint"
        )
    cfg = RenderConfig(width=int(d["width"]), height=int(d["height"]))
    fin = _finalize_fn(cfg)
    img = np.asarray(
        fin(Vec3(d["acc_x"], d["acc_y"], d["acc_z"]), int(d["sampled"]))
    )
    save_png(out_png, img)
    print(f"saved {out_png} ({int(d['sampled'])} passes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
