#!/usr/bin/env python
"""Isolate where fwd+bwd time goes: times HostGrad's forward chain, the
backward chain, and backward with restricted parameter sets (material
scalars only / no-texture) to test the scatter hypothesis.

Usage: python tools/grad_profile.py [--platform cpu] [--rays 2097152]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--rays", type=int, default=1 << 21)
    ap.add_argument("--bounces", type=int, default=9)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--span", type=int, default=1,
        help="bounces per jitted fwd/bwd program (must divide --bounces; "
        "span>1 folds k dispatches into one — the relay-latency lever, "
        "docs/perf.md)",
    )
    ap.add_argument(
        "--vary-keys", action="store_true",
        help="fold the rep index into the PRNG key so every rep is a "
        "distinct computation (bench.py's methodology).  The default "
        "same-key loop measured single-dispatch fused programs at "
        "impossible rates (fwd+bwd < fwd) on the relay — repeated "
        "identical dispatches are apparently short-circuited somewhere "
        "below JAX — so fused timings must use this flag",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="use HostGrad.value_and_grad_fused (single-dispatch "
        "fwd+loss+bwd; requires --span == --bounces)",
    )
    ap.add_argument(
        "--cases", default="all_params,no_atlas,mat_scalars_only",
        help="comma-separated subset of parameter-tier cases to run "
        "(each case compiles its own fwd/bwd program set — on the "
        "remote TPU compile service that is minutes per case, so span "
        "sweeps restrict to the tiers they report)",
    )
    args = ap.parse_args()

    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hanamaru_tpu import models
    from hanamaru_tpu.diff import params as dp
    from hanamaru_tpu.diff.hostgrad import HostGrad
    from hanamaru_tpu.ops.camera import normalized_coords
    from hanamaru_tpu.scene.compile import compile_scene
    from hanamaru_tpu.utils.vec import Vec2

    desc = models.build(models.DEFAULT_SCENE)
    cs = compile_scene(desc, models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    full_params, rest_full = dp.split(arrays)

    n = args.rays
    nc_all = normalized_coords(1920, 1080, 2)
    nc = jax.device_put(Vec2(nc_all.x[:n], nc_all.y[:n]))
    key = jax.random.PRNGKey(1)

    def loss_on_acc(acc):
        return (acc.x + acc.y + acc.z).mean()

    cases = {
        "all_params": full_params,
        "no_atlas": {k: v for k, v in full_params.items()
                     if not k.startswith(("tex_", "sky_"))},
        "mat_scalars_only": {k: v for k, v in full_params.items()
                             if k.startswith("mat_")},
    }
    wanted_cases = [c.strip() for c in args.cases.split(",") if c.strip()]
    unknown = set(wanted_cases) - set(cases)
    assert not unknown, f"unknown cases: {unknown} (have {list(cases)})"
    cases = {k: cases[k] for k in wanted_cases}

    for name, params in cases.items():
        rest = dp.merge({k: v for k, v in full_params.items()
                         if k not in params}, rest_full)
        hg = HostGrad(rest, cs.camera, lens_shape=desc.camera.lens_shape,
                      tex_channels=cs.tex_channels, span=args.span)

        def rep_key(i):
            return jax.random.fold_in(key, 777 + i) if args.vary_keys else key

        jax.block_until_ready(rep_key(0))  # warm the fold_in program

        # every timed rep feeds an accumulator the final block waits on:
        # independent same-shaped reps measured *below the device-compute
        # floor* on this relay (fwd+bwd "faster" than fwd — round-5 log,
        # docs/perf.md), i.e. un-consumed dispatches are not reliably
        # executed-and-waited-for.  Chaining restores bench.py semantics
        # (the progressive accumulator chains forward passes there).

        # fwd-only chain (warm the accumulator-add programs outside the
        # timed regions: each is a fresh remote compile per pytree shape)
        acc = hg.radiance(params, nc, key, args.bounces)
        acc = hg._add(acc, acc)
        jax.block_until_ready(acc.x)
        t0 = time.perf_counter()
        for i in range(args.reps):
            acc = hg._add(acc, hg.radiance(params, nc, rep_key(i), args.bounces))
        jax.block_until_ready(acc.x)
        fwd = (time.perf_counter() - t0) / args.reps

        # fwd+bwd
        vag = hg.value_and_grad_fused if args.fused else hg.value_and_grad
        _, g = vag(params, nc, key, args.bounces, loss_on_acc)
        total = hg._add(g, g)
        jax.block_until_ready(jax.tree.leaves(total)[0])
        total = g
        t0 = time.perf_counter()
        for i in range(args.reps):
            _, g = vag(params, nc, rep_key(i), args.bounces, loss_on_acc)
            total = hg._add(total, g)
        jax.block_until_ready(jax.tree.leaves(total)[0])
        both = (time.perf_counter() - t0) / args.reps

        print(json.dumps({
            "case": name,
            "fused": bool(args.fused),
            "vary_keys": bool(args.vary_keys),
            "span": args.span,
            "params": len(params),
            "fwd_secs": round(fwd, 4),
            "fwdbwd_secs": round(both, 4),
            "bwd_over_fwd": round(both / max(fwd, 1e-9), 1),
            "fwd_rays_per_sec": n * args.bounces and n / fwd,
            "fwdbwd_rays_per_sec": n / both,
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
