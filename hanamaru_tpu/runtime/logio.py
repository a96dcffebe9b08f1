"""Logging and image I/O for the progressive runtime.

Mirrors the reference's tee-to-result.txt logging (reference:
src/main.rs:47-51) and PNG outputs (renderer.rs:92-98, main.rs:1217).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Tee:
    """Print to stdout and append to result.txt (main.rs:47-51)."""

    def __init__(self, path: Optional[str]) -> None:
        self._f = open(path, "w") if path else None

    def __call__(self, message: str) -> None:
        print(message, flush=True)
        if self._f is not None:
            self._f.write(message + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


def save_png(path: str, image_u8: np.ndarray) -> None:
    """Write an [H,W,3] u8 array as PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.asarray(image_u8), mode="RGB").save(path)
