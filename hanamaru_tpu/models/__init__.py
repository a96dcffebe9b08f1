"""Scene registry — scenes as data, not code edits.

The reference hard-codes 9 scene builders and selects one by editing
main.rs (reference: src/main.rs:1269-1273).  Here every scene is a named
entry; `build(name)` returns a SceneDesc and the compiler lowers it to
device tables.

Asset paths are relative to an asset root: $HANAMARU_ASSETS if set, else
the reference checkout at /root/reference (textures/ and models/ live
there).
"""
from __future__ import annotations

import os
from typing import Callable

from ..scene.desc import SceneDesc

_REGISTRY: dict[str, Callable[[], SceneDesc]] = {}

DEFAULT_SCENE = "rtcamp6_v3_1"  # the reference's active default (main.rs:1273)


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def names() -> list[str]:
    return sorted(_REGISTRY)


def asset_root() -> str:
    root = os.environ.get("HANAMARU_ASSETS")
    if root:
        return root
    for cand in ("/root/reference", os.path.join(os.path.dirname(__file__), "..", "..", "assets")):
        if os.path.isdir(os.path.join(cand, "textures")):
            return cand
    return "."


def build(name: str) -> SceneDesc:
    if name not in _REGISTRY:
        raise KeyError(f"unknown scene {name!r}; have {names()}")
    return _REGISTRY[name]()


# import for registration side effects
from . import scenes as _scenes  # noqa: E402,F401
