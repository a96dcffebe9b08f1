#!/usr/bin/env python
"""Flagship inverse-rendering demo (BASELINE.json config 5).

Recovers material parameters of the material_examples scene
(reference: src/main.rs:139-249, the 5-BSDF ball lineup) from rendered
pixels alone: the TRUE scene tints three balls and roughens the GGX ball;
optimization starts from the published all-white scene and fits
albedo + roughness by Adam on the paired-sample MC loss, with gradients
flowing through the full wavefront path tracer (and pmean'd over a device
mesh when one is available).

Artifacts written to --out-dir:
  target.png / initial.png / recovered.png   (gamma-2.2 previews)
  loss_curve.json + loss_curve.png           (per-step loss)
  report.json                                (true vs recovered values)

CI runs this at reduced scale on the 8-device CPU mesh
(tests/test_inverse.py::test_inverse_demo_tool); the committed artifacts
in docs/inverse/ state their own scale in report.json (resolution/steps)
— consult it rather than assuming the defaults above were used.

Usage:
  python tools/inverse_demo.py --platform cpu --cpu-mesh 8 \
      --width 96 --height 54 --steps 60 --out-dir docs/inverse
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=6e-2)
    ap.add_argument("--lr-end", type=float, default=5e-3,
                    help="cosine-decay Adam lr to this; 0 = constant lr")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--target-spp", type=int, default=128)
    ap.add_argument("--num-bounces", type=int, default=4)
    ap.add_argument("--out-dir", type=str, default="docs/inverse")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force N virtual CPU devices (set before jax import)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--restarts", type=int, default=3,
                    help="independent Adam runs; the reported fit is the "
                    "restart with the lowest held-out evaluation error "
                    "(the GGX ball's loss landscape has a spurious "
                    "dark-albedo/high-roughness basin under MC noise)")
    ap.add_argument("--eval-spp", type=int, default=8)
    ap.add_argument("--view2", type=str, default=None, metavar="WxH",
                    help="fit a second camera view jointly (e.g. 256x144):"
                    " a close-up in which the GGX ball's highlight resolves"
                    " over many pixels — the multi-view cure for the"
                    " (albedo, roughness) degeneracy docs/inverse/README.md"
                    " characterizes for the wide view")
    ap.add_argument("--view2-eye", type=str, default="-1.0,1.3,2.6",
                    help="second-view camera eye (x,y,z)")
    ap.add_argument("--view2-at", type=str, default="-1.0,0.4,0.0",
                    help="second-view camera look-at target (x,y,z): the"
                    " GGX ball center (main.rs:238 lineup, ball x=-1)")
    ap.add_argument("--view2-fov", type=float, default=12.0,
                    help="second-view vertical fov in degrees (reference"
                    " tan(full-fov) convention, camera.rs:48)")
    ap.add_argument("--warm-start", type=str, default=None,
                    help="recovered_params.npz from a previous run: start "
                    "every restart from it instead of the published "
                    "all-white scene (the refine-at-higher-resolution "
                    "workflow docs/inverse/README.md prescribes for the "
                    "glossy-ball identifiability limit)")
    return ap


# the perturbation the optimizer must undo: ball index -> (albedo, rough)
TRUE_EDITS = {
    0: ((0.85, 0.25, 0.25), None),     # diffuse ball -> red
    1: ((0.25, 0.85, 0.30), 0.25),     # GGX ball -> green + rougher
    4: ((0.30, 0.45, 0.90), None),     # GGX-refraction ball -> blue
}


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
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
    import numpy as np

    from hanamaru_tpu import models
    from hanamaru_tpu.diff import params as dp
    from hanamaru_tpu.diff.inverse import fit, render_radiance
    from hanamaru_tpu.parallel.mesh import make_mesh
    from hanamaru_tpu.ops.camera import normalized_coords
    from hanamaru_tpu.runtime.logio import save_png
    from hanamaru_tpu.scene.compile import compile_scene

    os.makedirs(args.out_dir, exist_ok=True)
    W, H = args.width, args.height

    cs = compile_scene(models.build("material_examples"), models.asset_root())
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    init_params, rest = dp.split(arrays)

    # ball sphere i has material id sph_mat[i] (the lineup is elements 0-4)
    ball_mat = [int(cs.arrays.sph_mat[i]) for i in range(5)]
    true_params = dict(init_params)
    for ball, (alb, rough) in TRUE_EDITS.items():
        m = ball_mat[ball]
        for c, fname in zip(alb, ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b")):
            true_params[fname] = true_params[fname].at[m].set(c)
        if rough is not None:
            for fname in ("mat_rough_r", "mat_rough_g", "mat_rough_b"):
                true_params[fname] = true_params[fname].at[m].set(rough)

    nc = normalized_coords(W, H, 1)
    key = jax.random.PRNGKey(args.seed)

    def preview(params, key, spp, path, cam=None, nc_v=None, wh=None):
        cam = cs.camera if cam is None else cam
        nc_v = nc if nc_v is None else nc_v
        w, h = (W, H) if wh is None else wh
        arr = dp.merge(params, rest)
        rad = render_radiance(arr, cam, nc_v, key, args.num_bounces, spp)
        img = np.stack(
            [np.asarray(c).reshape(h, w) for c in (rad.x, rad.y, rad.z)],
            axis=-1,
        )
        u8 = (np.clip(img, 0.0, 1.0) ** (1 / 2.2) * 255).astype(np.uint8)
        save_png(path, u8)
        return rad

    target = preview(true_params, key, args.target_spp,
                     os.path.join(args.out_dir, "target.png"))

    # optional second camera view (the multi-view identifiability cure):
    # a pinhole close-up of the GGX ball whose highlight structure the
    # wide view cannot resolve
    extra_views = None
    view2 = None
    if args.view2:
        from hanamaru_tpu.scene.compile import compile_camera
        from hanamaru_tpu.scene.desc import CameraDesc

        w2, h2 = (int(v) for v in args.view2.split("x"))
        eye2 = tuple(float(v) for v in args.view2_eye.split(","))
        at2 = tuple(float(v) for v in args.view2_at.split(","))
        dist2 = float(np.linalg.norm(np.asarray(eye2) - np.asarray(at2)))
        cam2 = compile_camera(CameraDesc(
            eye=eye2, target=at2, v_fov=args.view2_fov,
            lens_shape="circle", aperture=0.0, focus_distance=dist2,
        ))
        nc2 = normalized_coords(w2, h2, 1)
        target2 = preview(true_params, jax.random.fold_in(key, 2),
                          args.target_spp,
                          os.path.join(args.out_dir, "target_view2.png"),
                          cam=cam2, nc_v=nc2, wh=(w2, h2))
        view2 = (cam2, nc2, target2, (w2, h2))
        extra_views = [(cam2, nc2, target2)]

    # params are a dict of pytrees, not of bare arrays (sky_intensity is
    # a Vec3 of scalars), so persistence flattens with jax key paths and
    # reloads against init_params' treedef
    import jax.tree_util as jtu

    fit_init = init_params
    if args.warm_start:
        loaded = dict(np.load(args.warm_start))
        flat_init, treedef = jtu.tree_flatten_with_path(init_params)
        known = {jtu.keystr(kp) for kp, _ in flat_init}
        unknown = set(loaded) - known
        assert not unknown, f"warm-start has unknown leaves: {unknown}"
        leaves = [
            jnp.asarray(loaded[jtu.keystr(kp)])
            if jtu.keystr(kp) in loaded else v
            for kp, v in flat_init
        ]
        fit_init = jtu.tree_unflatten(treedef, leaves)
        print(f"# warm start from {args.warm_start} "
              f"({len(loaded)} leaves)", file=sys.stderr)
    preview(fit_init, key, args.target_spp,
            os.path.join(args.out_dir, "initial.png"))

    mesh = make_mesh() if jax.device_count() > 1 else None
    if mesh is not None:
        print(f"# fitting on a {mesh.devices.size}-device mesh", file=sys.stderr)

    wanted = ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b",
              "mat_rough_r", "mat_rough_g", "mat_rough_b")

    def heldout_err(params):
        # paired-product evaluation, averaged over independent key pairs
        # (and over every fitted view): E[(A-t)(B-t)] = (E[render]-t)^2
        # without the estimator-variance floor that swamped a plain
        # one-render MSE (candidate differences are ~1e-3; the unpaired
        # variance floor was ~0.3)
        arr = dp.merge(params, rest)
        eval_views = [(cs.camera, nc, target)]
        if view2 is not None:
            eval_views.append(view2[:3])
        total = 0.0
        pairs = 4
        for i in range(pairs):
            for vi, (cam_v, nc_v, tgt_v) in enumerate(eval_views):
                ka, kb = jax.random.split(
                    jax.random.PRNGKey(args.seed + 90210 + 31 * vi + i))
                a = render_radiance(arr, cam_v, nc_v, ka, args.num_bounces,
                                    args.eval_spp, tex_channels=cs.tex_channels)
                b = render_radiance(arr, cam_v, nc_v, kb, args.num_bounces,
                                    args.eval_spp, tex_channels=cs.tex_channels)
                prod = ((a.x - tgt_v.x) * (b.x - tgt_v.x)
                        + (a.y - tgt_v.y) * (b.y - tgt_v.y)
                        + (a.z - tgt_v.z) * (b.z - tgt_v.z))
                total += float(jnp.mean(prod)) / len(eval_views)
        return total / pairs

    candidates = []
    for restart in range(max(args.restarts, 1)):
        result = fit(
            cs, target, fit_init, W, H,
            steps=args.steps, lr=args.lr, num_bounces=args.num_bounces,
            spp=args.spp, seed=args.seed + 1000 * restart,
            param_filter=lambda name: name in wanted,
            verbose=True, mesh=mesh,
            lr_end=args.lr_end or None,
            extra_views=extra_views,
        )
        # pull the candidate off the mesh: fitted leaves are replicated
        # 8-device arrays, and feeding those to the EAGER held-out /
        # preview renders forces a slow multi-device lowering of every op
        # (measured: the round-4 recovered-preview took ~35 min sharded
        # vs ~6 min single-device)
        cand = jax.tree.map(np.asarray, result.ema_params or result.params)
        err = heldout_err(cand)
        print(f"# restart {restart}: heldout {err:.5f}", file=sys.stderr)
        candidates.append((err, restart, cand, result))
    candidates.sort(key=lambda c: c[0])
    heldout, chosen, best, result = candidates[0]

    # report on the Polyak-averaged iterate of the best restart: the raw
    # final iterate carries step-to-step MC jitter the average does not
    preview(best, key, args.target_spp,
            os.path.join(args.out_dir, "recovered.png"))
    if view2 is not None:
        preview(best, jax.random.fold_in(key, 2), args.target_spp,
                os.path.join(args.out_dir, "recovered_view2.png"),
                cam=view2[0], nc_v=view2[1], wh=view2[3])
    # persist the recovered parameters for --warm-start refinement runs
    # (key-path flattened: some leaves live inside Vec3 pytrees)
    flat_best, _ = jtu.tree_flatten_with_path(best)
    np.savez(os.path.join(args.out_dir, "recovered_params.npz"),
             **{jtu.keystr(kp): np.asarray(v) for kp, v in flat_best})

    # report: true vs recovered for every perturbed channel
    report = {"losses_first": result.losses[0], "losses_last": result.losses[-1],
              "steps": args.steps, "resolution": f"{W}x{H}",
              "view2": (None if not args.view2 else {
                  "resolution": args.view2, "eye": args.view2_eye,
                  "at": args.view2_at, "v_fov": args.view2_fov}),
              "restarts": max(args.restarts, 1), "chosen_restart": chosen,
              "heldout_mse": heldout,
              "heldout_all": [round(c[0], 6) for c in sorted(candidates, key=lambda c: c[1])],
              "balls": {}}
    for ball, (alb, rough) in TRUE_EDITS.items():
        m = ball_mat[ball]
        rec_alb = [float(np.asarray(best[f])[m])
                   for f in ("mat_albedo_r", "mat_albedo_g", "mat_albedo_b")]
        entry = {"true_albedo": list(alb), "recovered_albedo": rec_alb,
                 "albedo_abs_err": float(np.abs(np.array(alb) - rec_alb).max())}
        if rough is not None:
            rec_r = float(np.asarray(best["mat_rough_r"])[m])
            entry["true_roughness"] = rough
            entry["recovered_roughness"] = rec_r
            entry["roughness_abs_err"] = abs(rough - rec_r)
        report["balls"][f"ball{ball}"] = entry

    with open(os.path.join(args.out_dir, "loss_curve.json"), "w") as f:
        json.dump(result.losses, f)
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=120)
        ax.plot(result.losses, lw=1.2)
        ax.set_yscale("log")
        ax.set_xlabel("Adam step")
        ax.set_ylabel("paired-sample loss")
        ax.set_title(f"inverse rendering, material_examples {W}x{H}")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "loss_curve.png"))
    except Exception as e:  # noqa: BLE001 — plot is a nicety
        print(f"# no loss plot: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
