#!/usr/bin/env python
"""Lean warm-start refinement for the flagship inverse demo.

Continues an `inverse_demo.py` fit from its recovered_params.npz with
the same two-view objective, stripped of everything that is not the
optimization itself: no preview renders, no held-out restart selection
(one chain), targets re-rendered at a configurable (lower) spp — target
Monte-Carlo noise only adds a parameter-independent constant to the
paired-sample loss E[(A-t)(B-t)] = (E[render]-t)^2 + Var-terms in t, so
the gradient stays unbiased and 64 spp targets refine as well as 128.

Writes report_refined.json + recovered_params_refined.npz next to the
warm-start file.  Used for the round-5 polish pass after the cold
two-view run landed in the correct basin but had not settled
(docs/inverse/README.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inverse_demo import TRUE_EDITS  # noqa: E402  (tools/ sibling import)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-start", required=True)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--view2", type=str, default="224x126")
    ap.add_argument("--view2-eye", type=str, default="-1.0,1.3,2.6")
    ap.add_argument("--view2-at", type=str, default="-1.0,0.4,0.0")
    ap.add_argument("--view2-fov", type=float, default=12.0)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--lr-end", type=float, default=2e-3)
    ap.add_argument("--target-spp", type=int, default=64)
    ap.add_argument("--num-bounces", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--cpu-mesh", type=int, default=0)
    ap.add_argument("--target-cache", type=str, default=None,
                    help="npz path: save the rendered two-view targets on "
                    "first use and load them on later runs (targets are "
                    "deterministic in --seed/--target-spp, and rendering "
                    "them costs ~12 min on this 2-core host)")
    args = ap.parse_args(argv)

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
            ).strip()
    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.diff import params as dp
    from hanamaru_tpu.diff.inverse import fit, render_radiance
    from hanamaru_tpu.ops.camera import normalized_coords
    from hanamaru_tpu.parallel.mesh import make_mesh
    from hanamaru_tpu.scene.compile import compile_camera, compile_scene
    from hanamaru_tpu.scene.desc import CameraDesc

    W, H = args.width, args.height
    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    init_params, rest = dp.split(arrays)

    ball_mat = [int(cs.arrays.sph_mat[i]) for i in range(5)]
    true_params = dict(init_params)
    for ball, (alb, rough) in TRUE_EDITS.items():
        m = ball_mat[ball]
        for c, f in zip(alb, ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b")):
            true_params[f] = true_params[f].at[m].set(c)
        if rough is not None:
            for f in ("mat_rough_r", "mat_rough_g", "mat_rough_b"):
                true_params[f] = true_params[f].at[m].set(rough)

    from hanamaru_tpu.utils.vec import Vec3

    key = jax.random.PRNGKey(args.seed)
    nc = normalized_coords(W, H, 1)
    w2, h2 = (int(v) for v in args.view2.split("x"))
    eye2 = tuple(float(v) for v in args.view2_eye.split(","))
    at2 = tuple(float(v) for v in args.view2_at.split(","))
    dist2 = float(np.linalg.norm(np.asarray(eye2) - np.asarray(at2)))
    cam2 = compile_camera(CameraDesc(eye=eye2, target=at2,
                                     v_fov=args.view2_fov,
                                     lens_shape="circle", aperture=0.0,
                                     focus_distance=dist2))
    nc2 = normalized_coords(w2, h2, 1)

    if args.target_cache and os.path.exists(args.target_cache):
        tc = dict(np.load(args.target_cache))
        target = Vec3(*(jnp.asarray(tc[f"t1_{c}"]) for c in "xyz"))
        target2 = Vec3(*(jnp.asarray(tc[f"t2_{c}"]) for c in "xyz"))
        print(f"# targets loaded from {args.target_cache}",
              file=sys.stderr, flush=True)
    else:
        target = render_radiance(dp.merge(true_params, rest), cs.camera, nc,
                                 key, args.num_bounces, args.target_spp)
        print("# target rendered", file=sys.stderr, flush=True)
        target2 = render_radiance(dp.merge(true_params, rest), cam2, nc2,
                                  jax.random.fold_in(key, 2),
                                  args.num_bounces, args.target_spp)
        print("# target_view2 rendered", file=sys.stderr, flush=True)
        if args.target_cache:
            np.savez(args.target_cache,
                     **{f"t1_{c}": np.asarray(getattr(target, c))
                        for c in "xyz"},
                     **{f"t2_{c}": np.asarray(getattr(target2, c))
                        for c in "xyz"})

    loaded = dict(np.load(args.warm_start))
    flat_init, treedef = jtu.tree_flatten_with_path(init_params)
    leaves = [jnp.asarray(loaded[jtu.keystr(kp)])
              if jtu.keystr(kp) in loaded else v for kp, v in flat_init]
    fit_init = jtu.tree_unflatten(treedef, leaves)

    mesh = make_mesh() if jax.device_count() > 1 else None
    wanted = ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b",
              "mat_rough_r", "mat_rough_g", "mat_rough_b")
    result = fit(
        cs, target, fit_init, W, H,
        steps=args.steps, lr=args.lr, num_bounces=args.num_bounces,
        spp=1, seed=args.seed + 5000,
        param_filter=lambda n: n in wanted, verbose=True, mesh=mesh,
        lr_end=args.lr_end or None,
        extra_views=[(cam2, nc2, target2)],
    )
    best = jax.tree.map(np.asarray, result.ema_params or result.params)

    out_dir = os.path.dirname(os.path.abspath(args.warm_start))
    flat_best, _ = jtu.tree_flatten_with_path(best)
    np.savez(os.path.join(out_dir, "recovered_params_refined.npz"),
             **{jtu.keystr(kp): np.asarray(v) for kp, v in flat_best})

    report = {"refined_from": args.warm_start, "steps": args.steps,
              "lr": args.lr, "lr_end": args.lr_end,
              "target_spp": args.target_spp,
              "resolution": f"{W}x{H}", "view2": args.view2, "balls": {}}
    for ball, (alb, rough) in TRUE_EDITS.items():
        m = ball_mat[ball]
        rec = [float(np.asarray(best[f])[m])
               for f in ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b")]
        entry = {"true_albedo": list(alb), "recovered_albedo": rec,
                 "albedo_abs_err": float(np.abs(np.array(alb) - rec).max())}
        if rough is not None:
            rr = float(np.asarray(best["mat_rough_r"])[m])
            entry.update(true_roughness=rough, recovered_roughness=rr,
                         roughness_abs_err=abs(rough - rr))
        report["balls"][f"ball{ball}"] = entry
    with open(os.path.join(out_dir, "report_refined.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
