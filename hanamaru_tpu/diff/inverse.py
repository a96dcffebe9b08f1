"""Inverse rendering: recover scene parameters by gradient descent.

BASELINE.json config 5: starting from perturbed materials, fit
albedo/roughness (and optionally texture texels) so that rendered pixels
match a target image, pixel gradients flowing through the full wavefront
path tracer.  Optimization uses optax Adam; for multi-chip fitting use
parallel.render.train_step_sharded instead (same loss, psum'd grads).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..diff import params as dp
from ..ops import integrator
from ..ops.camera import normalized_coords
from ..scene.compile import CompiledScene
from ..utils.vec import Vec3


@dataclass
class FitResult:
    params: dict[str, Any]
    losses: list[float]


def render_radiance(arrays, cam, nc, key, num_bounces: int, spp: int) -> Vec3:
    """Mean radiance over spp progressive passes (smooth target/render)."""
    acc = None
    for i in range(spp):
        rad = integrator.render_pass(arrays, cam, nc, jax.random.fold_in(key, i), num_bounces)
        acc = rad if acc is None else acc + rad
    return acc * (1.0 / spp)


def fit(
    cs: CompiledScene,
    target: Vec3,
    init_params: dict[str, Any],
    width: int,
    height: int,
    steps: int = 100,
    lr: float = 5e-2,
    num_bounces: int = 4,
    spp: int = 1,
    seed: int = 0,
    param_filter: Optional[Callable[[str], bool]] = None,
    verbose: bool = False,
) -> FitResult:
    """Adam-fit the differentiable scene parameters to a target radiance
    image rendered at (width, height) with supersampling off."""
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    _, rest = dp.split(arrays)
    nc = normalized_coords(width, height, 1)
    keep = param_filter or (lambda name: True)

    # only optimize selected fields; the rest stay fixed in `frozen`
    train = {k: v for k, v in init_params.items() if keep(k)}
    frozen = {k: v for k, v in init_params.items() if not keep(k)}

    opt = optax.adam(lr)
    opt_state = opt.init(train)

    def loss_fn(train, key):
        """Unbiased squared-error surrogate for Monte-Carlo renders.

        A plain MSE of a 1-spp render against the target is biased: its
        expectation contains the estimator variance, whose gradient pushes
        parameters toward *darker* scenes (less indirect light = less
        noise).  Using two independent renders A, B and
        E[(A-t)(B-t)] = (E[render]-t)^2 removes the variance term — the
        standard paired-sample trick in differentiable Monte-Carlo
        rendering."""
        arr = dp.merge({**frozen, **train}, rest)
        ka, kb = jax.random.split(key)
        a = render_radiance(arr, cs.camera, nc, ka, num_bounces, spp)
        b = render_radiance(arr, cs.camera, nc, kb, num_bounces, spp)
        da = a - target
        db = b - target
        return (da.x * db.x + da.y * db.y + da.z * db.z).mean()

    @jax.jit
    def step(train, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(train, key)
        updates, opt_state = opt.update(grads, opt_state)
        train = optax.apply_updates(train, updates)
        return train, opt_state, loss

    losses = []
    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        train, opt_state, loss = step(train, opt_state, jax.random.fold_in(key, i))
        losses.append(float(loss))
        if verbose and (i % 10 == 0 or i == steps - 1):
            print(f"step {i}: loss {losses[-1]:.6f}")
    return FitResult(params={**frozen, **train}, losses=losses)
