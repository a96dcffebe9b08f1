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
from ..utils.vec import Vec2, Vec3


@dataclass
class FitResult:
    params: dict[str, Any]
    losses: list[float]
    # Polyak (EMA) average of the projected iterates: under Monte-Carlo
    # gradient noise the raw final iterate wanders (and rectifies against
    # clamp boundaries); the average is the better point estimate
    ema_params: dict[str, Any] | None = None


def render_radiance(arrays, cam, nc, key, num_bounces: int, spp: int,
                    tex_channels=(True, True, True)) -> Vec3:
    """Mean radiance over spp progressive passes (smooth target/render)."""
    acc = None
    for i in range(spp):
        rad = integrator.render_pass(arrays, cam, nc, jax.random.fold_in(key, i), num_bounces,
                                     tex_channels=tex_channels)
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
    mesh=None,
    lr_end: Optional[float] = None,
    extra_views: Optional[list] = None,
) -> FitResult:
    """Adam-fit the differentiable scene parameters to a target radiance
    image rendered at (width, height) with supersampling off.

    With a `mesh`, rays and the target shard over the ray axis and the
    per-shard gradients pmean over ICI inside a shard_map (parameters and
    the Adam state stay replicated) — the multi-chip trainer BASELINE.json
    config 5 calls for.

    `extra_views`: optional list of (CameraArrays, nc Vec2, target Vec3)
    tuples fitted jointly with the primary view (equal weight per view:
    the loss is the mean of the per-view paired losses).  Multi-view
    observation is the classic cure for single-image ambiguities — for
    this project, the glossy-ball (albedo, roughness) degeneracy
    docs/inverse/README.md characterizes: a second camera that resolves
    the highlight pins parameters one wide view cannot."""
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    _, rest = dp.split(arrays)
    nc = normalized_coords(width, height, 1)
    keep = param_filter or (lambda name: True)

    views_cam = [cs.camera] + [v[0] for v in (extra_views or [])]
    views_nc = tuple([nc] + [v[1] for v in (extra_views or [])])
    views_tgt = tuple([target] + [v[2] for v in (extra_views or [])])

    # only optimize selected fields; the rest stay fixed in `frozen`
    train = {k: v for k, v in init_params.items() if keep(k)}
    frozen = {k: v for k, v in init_params.items() if not keep(k)}

    # cosine-decayed lr (lr -> lr_end) tames the late-phase parameter
    # jitter of Adam under Monte-Carlo gradient noise; constant lr when
    # lr_end is None
    if lr_end is not None:
        schedule = optax.cosine_decay_schedule(
            lr, max(steps, 1), alpha=lr_end / lr
        )
        opt = optax.adam(schedule)
    else:
        opt = optax.adam(lr)
    opt_state = opt.init(train)

    def loss_fn(train, rest, ncs, key, targets):
        """Unbiased squared-error surrogate for Monte-Carlo renders.

        A plain MSE of a 1-spp render against the target is biased: its
        expectation contains the estimator variance, whose gradient pushes
        parameters toward *darker* scenes (less indirect light = less
        noise).  Using two independent renders A, B and
        E[(A-t)(B-t)] = (E[render]-t)^2 removes the variance term — the
        standard paired-sample trick in differentiable Monte-Carlo
        rendering.  Multi-view: mean of the per-view paired losses (the
        cameras are tiny static constants, closed over)."""
        arr = dp.merge({**frozen, **train}, rest)
        tc = cs.tex_channels
        total = 0.0
        for vi, (cam_v, nc_v, tgt_v) in enumerate(zip(views_cam, ncs, targets)):
            # single-view keeps the historical key derivation exactly
            kv = key if len(views_cam) == 1 else jax.random.fold_in(key, vi)
            ka, kb = jax.random.split(kv)
            a = render_radiance(arr, cam_v, nc_v, ka, num_bounces, spp, tex_channels=tc)
            b = render_radiance(arr, cam_v, nc_v, kb, num_bounces, spp, tex_channels=tc)
            da = a - tgt_v
            db = b - tgt_v
            total = total + (da.x * db.x + da.y * db.y + da.z * db.z).mean()
        return total / len(views_cam)

    if mesh is None:

        def value_and_grad(train, rest, ncs, key, targets):
            return jax.value_and_grad(loss_fn)(train, rest, ncs, key, targets)

    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import RAY_AXIS

        ray_p = P(RAY_AXIS)
        n_dev = mesh.devices.size
        for v_nc in views_nc:
            assert v_nc.x.shape[0] % n_dev == 0, (
                f"view ray count {v_nc.x.shape[0]} must divide the "
                f"{n_dev}-device mesh"
            )

        def shard_fn(train, rest, nc_s, key, tgt_s):
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            loss, grads = jax.value_and_grad(loss_fn)(
                train, rest, nc_s, key, tgt_s
            )
            loss = jax.lax.pmean(loss, RAY_AXIS)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, RAY_AXIS), grads)
            return loss, grads

        value_and_grad = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(),
                      tuple(Vec2(ray_p, ray_p) for _ in views_cam), P(),
                      tuple(Vec3(ray_p, ray_p, ray_p) for _ in views_cam)),
            out_specs=(P(), P()),
            check_vma=False,
        )

    @jax.jit
    def step(train, opt_state, rest, ncs, key, targets):
        loss, grads = value_and_grad(train, rest, ncs, key, targets)
        updates, opt_state = opt.update(grads, opt_state)
        train = optax.apply_updates(train, updates)
        # projected Adam: clamp each field into its physical domain
        # (dp._DOMAINS) — an unprojected step can wander into e.g.
        # negative roughness, where the forward model is meaningless and
        # the fit diverges
        train = dp.project(train)
        return train, opt_state, loss

    # Polyak/EMA average with Adam-style bias correction: the accumulator
    # starts at ZERO and the readout divides by (1 - decay^t), so the
    # average carries no weight on the (wrong) starting point — an
    # uncorrected EMA seeded at the initial parameters retains
    # decay^steps (~22% at 150 steps) of the initialization in the
    # reported estimate (advisor finding, round 3)
    ema_decay = 0.99

    @jax.jit
    def ema_update(ema, train):
        return jax.tree.map(
            lambda e, t: ema_decay * e + (1.0 - ema_decay) * t, ema, train
        )

    losses = []
    ema = jax.tree.map(jnp.zeros_like, train)
    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        train, opt_state, loss = step(
            train, opt_state, rest, views_nc, jax.random.fold_in(key, i),
            views_tgt,
        )
        ema = ema_update(ema, train)
        losses.append(float(loss))
        if verbose and (i % 10 == 0 or i == steps - 1):
            print(f"step {i}: loss {losses[-1]:.6f}")
    if steps > 0:
        corr = 1.0 - ema_decay ** steps
        ema_avg = jax.tree.map(lambda e: e / corr, ema)
    else:
        ema_avg = train
    return FitResult(
        params={**frozen, **train}, losses=losses,
        ema_params={**frozen, **dp.project(ema_avg)},
    )
