"""Sharded rendering and the differentiable training step.

Forward rendering: rays are sharded over the mesh's ray axis via
shard_map; every device traverses its own ray block against replicated
scene tables — zero cross-chip traffic until the framebuffer is
assembled.

Training (inverse rendering): per-shard parameter gradients are
all-reduced with a psum over the ray axis inside the shard_map, which XLA
schedules on ICI and overlaps with the backward bounce scan — the
TPU-native analogue the build plan calls for (SURVEY.md §5, §7.9).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..diff import params as dp
from ..ops import integrator
from ..scene.compile import CameraArrays, SceneArrays
from ..utils.vec import Vec2, Vec3
from .mesh import RAY_AXIS


def render_pass_sharded(
    mesh: Mesh,
    arrays: SceneArrays,
    cam: CameraArrays,
    nc: Vec2,
    key,
    num_bounces: int,
    lens_shape: str = "circle",
    direct_light_mode: str = "reference",
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
) -> Vec3:
    """One progressive pass with rays sharded over the mesh.

    nc length must be divisible by the mesh size (pad upstream)."""

    def shard_fn(nc_shard: Vec2, key) -> Vec3:
        # decorrelate the per-device RNG streams
        key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
        return integrator.render_pass(
            arrays, cam, nc_shard, key, num_bounces,
            lens_shape=lens_shape, direct_light_mode=direct_light_mode,
            tex_channels=tex_channels,
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(Vec2(P(RAY_AXIS), P(RAY_AXIS)), P()),
        out_specs=Vec3(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )
    return fn(nc, key)


def loss_fn(
    params: dict[str, Any],
    rest: SceneArrays,
    cam: CameraArrays,
    nc: Vec2,
    key,
    target: Vec3,
    num_bounces: int,
    tex_channels: tuple[bool, bool, bool] = (True, True, True),
) -> jax.Array:
    """Mean squared error between a rendered pass and target radiance."""
    arrays = dp.merge(params, rest)
    rad = integrator.render_pass(arrays, cam, nc, key, num_bounces,
                                 tex_channels=tex_channels)
    d = rad - target
    return (d.x * d.x + d.y * d.y + d.z * d.z).mean()


def train_step_sharded(
    mesh: Mesh,
    params: dict[str, Any],
    rest: SceneArrays,
    cam: CameraArrays,
    nc: Vec2,
    key,
    target: Vec3,
    num_bounces: int,
    lr: float = 1e-2,
):
    """One SGD step on scene parameters, rays sharded over the mesh.

    Returns (new_params, loss).  Gradients and the loss are psum-averaged
    over the ray axis (ICI collective); parameters stay replicated."""

    def shard_fn(params, nc_shard: Vec2, key, target_shard: Vec3):
        key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, rest, cam, nc_shard, key, target_shard, num_bounces
        )
        loss = jax.lax.pmean(loss, RAY_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, RAY_AXIS), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),                                   # params replicated
            Vec2(P(RAY_AXIS), P(RAY_AXIS)),        # rays sharded
            P(),
            Vec3(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(params, nc, key, target)
