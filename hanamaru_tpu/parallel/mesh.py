"""Device mesh construction and sharding helpers.

The reference's only parallelism is rayon work-stealing over pixels on one
CPU (reference: src/renderer.rs:33).  The TPU-native equivalent shards the
flat ray/pixel axis across a device mesh: rendering is embarrassingly
parallel in rays, scene tables are replicated, and the only collectives are
the parameter-gradient psum in training (ICI) and the framebuffer gather at
the end of a render.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (RAY_AXIS,), devices=devs)


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """1D arrays sharded along the ray axis."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
