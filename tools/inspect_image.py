#!/usr/bin/env python
"""Texture statistics utility (reference: src/main.rs:1297-1312
inspect_image): min/max/avg of the first channel of an image file."""
from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: inspect_image.py <image>", file=sys.stderr)
        return 2
    from PIL import Image

    a = np.asarray(Image.open(sys.argv[1]).convert("RGB"), np.float64)
    c = a[..., 0]
    print(f"min: {c.min()} max: {c.max()} avg: {c.mean()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
