"""Command-line entry point.

Flag-for-flag parity with the reference CLI (reference:
src/main.rs:1230-1256) — including `-h` meaning *height* (help is
`--help`) and the rtcamp6-regulation defaults — plus scene selection,
debug-mode choice and checkpoint/resume, which the reference only offered
as code edits.

Run:  python -m hanamaru_tpu [options]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

from ..config import RenderConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hanamaru_tpu", add_help=False,
        description="TPU-native progressive path tracer",
    )
    p.add_argument("--help", action="help", help="print this help menu")
    p.add_argument("-d", "--debug", action="store_true", help="use debug mode")
    p.add_argument("-w", "--width", type=int, default=1920, help="output resolution width")
    p.add_argument("-h", "--height", type=int, default=1080, help="output resolution height")
    p.add_argument("-s", "--sampling", type=int, default=1000, help="sampling limit")
    p.add_argument("-t", "--time", type=float, default=123.0, help="time limit sec")
    p.add_argument("-i", "--interval", type=float, default=15.0, help="report interval sec")
    p.add_argument("--scene", type=str, default=None, help="scene name (see --list-scenes)")
    p.add_argument("--list-scenes", action="store_true", help="list registered scenes")
    p.add_argument(
        "--debug-mode", type=str, default="focal_plane",
        choices=["shading", "normal", "depth", "focal_plane"],
        help="debug renderer mode (reference default: FocalPlane, main.rs:1280)",
    )
    p.add_argument("--out-dir", type=str, default=".", help="output directory")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="write renderer state here at every report interval "
                   "and on finish (crash-safe resume point)")
    p.add_argument("--resume", type=str, default=None, help="resume renderer state from this checkpoint")
    p.add_argument("--seed", type=int, default=8700304)
    p.add_argument(
        "--direct-light-mode", type=str, default="reference",
        choices=["reference", "nee_clamp"],
    )
    p.add_argument(
        "--strict-reference-rng", action="store_true",
        help="reuse one uniform pair per bounce for the BSDF sample and "
        "every NEE light sample, exactly like renderer.rs:175,183 "
        "(default: independent pairs; identical marginals)",
    )
    p.add_argument(
        "--max-rays-per-chunk", type=int, default=None,
        help="rays per device dispatch (default 2^23 — best for TPU HBM; "
        "use ~2^18 on the CPU backend, where the lockstep BVH walk wants "
        "chunks that fit in cache)",
    )
    p.add_argument(
        "--compact-from-bounce", type=int, default=None,
        help="stream-compact live rays from this bounce on (single-chip; "
        "identical image, see ops/compaction.py)",
    )
    p.add_argument(
        "--traversal", type=str, default="xla",
        choices=["xla", "pallas", "pallas_interpret"],
        help="BVH traversal backend (pallas = tile-uniform Mosaic kernel, "
        "TPU only; identical hits but ~250x slower than xla AND known to "
        "crash this environment's TPU worker after its run — requires "
        "--unsafe-pallas-traversal on a real TPU; see docs/perf.md)",
    )
    p.add_argument(
        "--unsafe-pallas-traversal", action="store_true",
        help="acknowledge that --traversal pallas reproducibly crashes "
        "the TPU worker process after running (docs/perf.md, 2026-08-20 "
        "measurements), degrading the shared relay for ~15 min",
    )
    p.add_argument(
        "--mesh", action="store_true",
        help="shard rendering over all local devices (shard_map over the "
        "ray axis; automatic when more than one device is visible)",
    )
    p.add_argument("--coordinator", type=str, default=None,
                   help="jax.distributed coordinator address (multi-host)")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument(
        "--profile-dir", type=str, default=None,
        help="capture a jax.profiler trace of the render into this directory "
        "(TPU-native replacement for the reference's wall-clock-only timing, "
        "main.rs:1267-1277)",
    )
    p.add_argument(
        "--platform", type=str, default=None,
        help="force a jax platform (e.g. cpu); the TPU plugin in this "
        "environment ignores JAX_PLATFORMS, so this uses jax.config",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .. import models

    if args.list_scenes:
        print("\n".join(models.names()))
        return 0

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .cache import enable_persistent_cache

    enable_persistent_cache()

    from ..parallel.distributed import initialize as dist_init

    dist_init(args.coordinator, args.process_id, args.num_processes)

    from ..scene.compile import compile_scene
    from .logio import Tee
    from .progressive import ProgressiveRenderer, render_debug

    if (
        args.traversal == "pallas"
        and not args.unsafe_pallas_traversal
        and any(d.platform == "tpu" for d in jax.devices())
    ):
        print(
            "--traversal pallas on a real TPU reproducibly crashes the "
            "TPU worker after its run (docs/perf.md); pass "
            "--unsafe-pallas-traversal to run it anyway, or use the "
            "default xla traversal (faster on every measured ray class).",
            file=sys.stderr,
        )
        return 2

    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        sampling=args.sampling,
        time_limit_sec=args.time,
        report_interval_sec=args.interval,
        seed=args.seed,
        direct_light_mode=args.direct_light_mode,
        strict_reference_rng=args.strict_reference_rng,
        compact_from_bounce=args.compact_from_bounce,
        traversal=args.traversal,
        **(
            {"max_rays_per_chunk": args.max_rays_per_chunk}
            if args.max_rays_per_chunk
            else {}
        ),
    )
    scene_name = args.scene or models.DEFAULT_SCENE

    os.makedirs(args.out_dir, exist_ok=True)
    tee = Tee(os.path.join(args.out_dir, "result.txt"))
    total_begin = time.monotonic()

    tee(f"devices: {jax.device_count()} ({jax.devices()[0].platform}).")
    tee(f"resolution: {cfg.width}x{cfg.height}.")
    tee(f"max sampling: {cfg.sampling}x{cfg.rays_per_pixel_per_pass} spp.")
    tee(f"time limit: {cfg.time_limit_sec:.2f} sec.")
    tee(f"report interval: {cfg.report_interval_sec:.2f} sec.")
    tee(f"scene: {scene_name}.")

    t0 = time.monotonic()
    desc = models.build(scene_name)
    cs = compile_scene(desc, models.asset_root())
    tee(f"init scene: {time.monotonic() - t0:.2f} sec.")
    tee(f"scene stats: {cs.stats}.")

    import contextlib

    profile_cm = (
        jax.profiler.trace(args.profile_dir)
        if args.profile_dir
        else contextlib.nullcontext()
    )
    if args.debug:
        with profile_cm:
            result = render_debug(cs, cfg, mode=args.debug_mode, out_dir=args.out_dir, tee=tee)
    else:
        lens_shape = desc.camera.lens_shape
        mesh = None
        if args.mesh or jax.device_count() > 1:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
            tee(f"mesh: {mesh.devices.size} devices over '{mesh.axis_names[0]}'.")
            # surface the two mesh-mode semantic caveats (README "mesh
            # mode" notes): compaction needs one static shape across
            # devices, and per-device RNG folding changes the sample set
            if cfg.compact_from_bounce is not None:
                tee(
                    "mesh mode: stream compaction disabled (per-device "
                    "live counts diverge; dead-lane masking used instead)."
                )
            tee(
                "mesh mode: per-device RNG folding samples different "
                "random sequences than a single-device render — images "
                "converge to the same limit but are not bit-identical."
            )
        r = ProgressiveRenderer(
            cs, cfg, out_dir=args.out_dir, tee=tee, lens_shape=lens_shape,
            mesh=mesh, checkpoint_path=args.checkpoint,
        )
        if args.resume:
            r.load_checkpoint(args.resume)
            tee(f"resumed from {args.resume} at sampling {r.sampled}.")
        with profile_cm:
            result = r.render()
        if args.checkpoint:
            r.save_checkpoint(args.checkpoint)
            tee(f"checkpoint: {args.checkpoint}.")

    tee(f"sampled: {result.sampled}x{cfg.rays_per_pixel_per_pass} spp.")
    total_sec = time.monotonic() - total_begin
    used_percent = total_sec / cfg.time_limit_sec * 100.0
    tee(
        f"total {total_sec} sec. used {used_percent:.2f} % "
        f"(x {100.0 / max(used_percent, 1e-9):.2f})"
    )
    tee(f"primary rays/sec: {result.rays_per_sec:.3e}")
    tee.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
