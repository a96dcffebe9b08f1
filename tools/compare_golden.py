#!/usr/bin/env python
"""Compare a render against the reference's committed competition output.

The reference ships `rtcamp6_1000x4spp.png` (1920x1080, 1000 passes x 4
spp) as its golden image (README.md:19, SURVEY.md §4).  Our RNG differs
from Rust's StdRng so per-pixel noise cannot match; this tool compares
*converged structure*: both images are downscaled (box filter), then
per-channel mean error, RMSE and a luminance correlation are reported.

Usage:  python tools/compare_golden.py <ours.png> [<reference.png>] [--scale 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load(path: str, size) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BOX)
    return np.asarray(img, np.float64) / 255.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument(
        "reference",
        nargs="?",
        default=os.path.join(
            os.environ.get("HANAMARU_ASSETS", "/root/reference"),
            "rtcamp6_1000x4spp.png",
        ),
    )
    ap.add_argument("--scale", type=int, default=8, help="downscale factor")
    args = ap.parse_args()

    from PIL import Image

    ref_img = Image.open(args.reference)
    size = (ref_img.width // args.scale, ref_img.height // args.scale)
    ref = load(args.reference, size)
    ours = load(args.ours, size)

    diff = ours - ref
    lum = lambda a: 0.22 * a[..., 0] + 0.707 * a[..., 1] + 0.071 * a[..., 2]
    lo, lr = lum(ours), lum(ref)
    corr = float(
        np.corrcoef(lo.ravel(), lr.ravel())[0, 1]
    )
    out = {
        "downscaled": list(size),
        "mean_ours": [round(float(m), 4) for m in ours.mean((0, 1))],
        "mean_ref": [round(float(m), 4) for m in ref.mean((0, 1))],
        "mean_abs_err": round(float(np.abs(diff).mean()), 4),
        "rmse": round(float(np.sqrt((diff ** 2).mean())), 4),
        "luminance_corr": round(corr, 4),
    }
    print(json.dumps(out))
    # loose structural gate: a correct render of the same scene correlates
    # strongly even with different sampling noise
    return 0 if corr > 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
