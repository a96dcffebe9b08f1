"""Progressive, time-budgeted render driver.

Host-side counterpart of the reference's Renderer trait default loop +
PathTracingRenderer reporting (reference: src/renderer.rs:25-99, 205-251):
the device renders one progressive pass at a time into a persistent
accumulation buffer (buffer donation keeps it in HBM); the host interleaves
wall-clock decisions — predictive time-limit stop at 1.1x the last pass
cost (renderer.rs:217-226), interval snapshots to NNN.png
(renderer.rs:239-247) — with async device execution.

Also provides checkpoint/resume: the accumulation buffer + pass counter +
RNG seed are the full renderer state (the reference keeps the same state
implicitly but never persists it, SURVEY.md §5).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..ops import integrator
from ..ops.camera import normalized_coords
from ..ops.postprocess import finalize_image
from ..parallel.distributed import agree_snapshot, agree_stop, is_primary
from ..scene.compile import CompiledScene
from ..utils.vec import Vec2, Vec3
from .logio import Tee, save_png


def fetch_image(img) -> np.ndarray:
    """Device -> host copy of an [H,W,3] image in row blocks.

    Large single transfers (>~4 MB) hang this environment's TPU relay;
    block-wise fetches are reliable and just as fast.  The block size is
    tunable via HANAMARU_FETCH_BLOCK_BYTES (default 1 MiB): on degraded
    relay days even 1 MiB fetches have aborted the worker while small
    blocks survived (docs/perf.md golden-render log)."""
    img = jax.block_until_ready(img)
    h = img.shape[0]
    row_bytes = max(1, int(np.prod(img.shape[1:]))) * img.dtype.itemsize
    block_bytes = int(os.environ.get("HANAMARU_FETCH_BLOCK_BYTES", 1 << 20))
    step = max(1, block_bytes // row_bytes)
    if h <= step:
        return np.asarray(img)
    return np.concatenate(
        [np.asarray(img[i : i + step]) for i in range(0, h, step)], axis=0
    )


@dataclass
class RenderResult:
    image: np.ndarray          # [H,W,3] u8
    sampled: int               # progressive passes completed
    seconds: float
    rays_per_sec: float


def _pass_fn(
    cs: CompiledScene, cfg: RenderConfig, lens_shape: str, mesh=None
):
    """Build the one-pass accumulate step as a host-driven bounce loop.

    The bounce loop runs on the host over a single jitted `bounce_step`
    whose bounce index is a traced scalar: one small compiled program
    serves all 9 bounces and all passes.  (A device-side lax.scan of the
    same body compiles fine but executes pathologically slowly on the TPU
    runtime here — ~10s/bounce vs 0.2ms for the step alone — so the loop
    stays on the host; dispatches are async and overhead is microseconds.)

    With a `mesh`, every step is shard_mapped over the mesh's ray axis:
    scene tables replicate, ray state shards, and the traversal loop runs
    independently per chip (its termination test stays shard-local, which
    a GSPMD-partitioned while_loop would turn into a per-iteration
    all-reduce).  The framebuffer accumulator stays sharded; only
    finalize gathers.
    """
    ss2 = cfg.rays_per_pixel_per_pass
    n_rays = cfg.width * cfg.height * ss2

    # A pass is processed in fixed-size ray chunks: bounds the integrator's
    # per-dispatch working set (full-frame 1080p batches fault this TPU
    # runtime) and is also the natural unit for multi-chip sharding.
    n_dev = 1 if mesh is None else mesh.devices.size
    granule = ss2 * n_dev
    chunk = max(min(cfg.max_rays_per_chunk, n_rays), granule)
    chunk -= chunk % granule
    num_chunks = -(-n_rays // chunk)
    chunk_pixels = chunk // ss2
    padded_pixels = num_chunks * chunk_pixels

    # nc is passed as an *argument* (device-resident), never a closure
    # constant: large constants embedded in the HLO make the remote TPU
    # compile service pathologically slow
    nc_full = normalized_coords(cfg.width, cfg.height, cfg.supersampling)
    pad = num_chunks * chunk - n_rays
    if pad:
        nc_full = Vec2(
            jnp.concatenate([nc_full.x, nc_full.x[-pad:]]),
            jnp.concatenate([nc_full.y, nc_full.y[-pad:]]),
        )
    nc_chunks = [
        jax.device_put(
            Vec2(
                nc_full.x[i * chunk : (i + 1) * chunk],
                nc_full.y[i * chunk : (i + 1) * chunk],
            )
        )
        for i in range(num_chunks)
    ]

    def raygen_fn(nc, key) -> integrator.PathState:
        n = nc.x.shape[0]
        k_lens, _ = jax.random.split(key)
        k1, k2 = jax.random.split(k_lens)
        u1 = jax.random.uniform(k1, (n,), nc.x.dtype)
        u2 = jax.random.uniform(k2, (n,), nc.x.dtype)
        from ..ops.camera import ray_with_dof

        o, d = ray_with_dof(cs.camera, nc, u1, u2, lens_shape)
        return integrator.init_path_state(o, d)

    tex_channels = cs.tex_channels

    def bounce_fn(arrays, state, key, bounce_idx):
        return integrator.bounce_step(
            arrays, state, key, bounce_idx,
            direct_light_mode=cfg.direct_light_mode,
            traversal=cfg.traversal,
            tex_channels=tex_channels,
            strict_reference_rng=cfg.strict_reference_rng,
        )

    def bounce_compact_fn(arrays, state, key, bounce_idx, lane_ids):
        return integrator.bounce_step(
            arrays, state, key, bounce_idx,
            direct_light_mode=cfg.direct_light_mode,
            lane_ids=lane_ids, n_total=chunk,
            traversal=cfg.traversal,
            tex_channels=tex_channels,
            strict_reference_rng=cfg.strict_reference_rng,
        )

    def accumulate_fn(rad: Vec3, acc: Vec3, chunk_idx) -> Vec3:
        """acc is [num_chunks, chunk_pixels] (chunk-major rows); the pixel
        axis shards across devices, so every device updates its own slice
        of row `chunk_idx` locally."""

        def upd(acc_c, rad_c):
            pix = rad_c.reshape(-1, ss2).sum(axis=1)
            row = jax.lax.dynamic_slice(
                acc_c, (chunk_idx, 0), (1, pix.shape[0])
            )
            return jax.lax.dynamic_update_slice(
                acc_c, row + pix[None, :], (chunk_idx, 0)
            )

        return Vec3(upd(acc.x, rad.x), upd(acc.y, rad.y), upd(acc.z, rad.z))

    # forward bounce fusion (cfg.bounce_span): unroll k bounce steps in
    # one jitted program — same ops, same RNG (bounce_fn keys by
    # bounce_idx), k-fold fewer host dispatches.  Compaction needs
    # per-bounce host control, so spans apply only to the masked path.
    if cfg.bounce_span < 0:
        # auto: full-pass fusion on accelerators; span 3 on CPU, where
        # unrolling all 9 bounces only slows the XLA:CPU compile
        span = (cfg.num_bounces if jax.default_backend() != "cpu"
                else (3 if cfg.num_bounces % 3 == 0 else 1))
    else:
        span = cfg.bounce_span if cfg.bounce_span > 0 else 1
    if cfg.num_bounces % span or cfg.compact_from_bounce is not None:
        span = 1

    def bounce_span_fn(arrays, state, key, b0):
        for j in range(span):
            state = bounce_fn(arrays, state, key, b0 + j)
        return state

    # whole-pass fusion (span == num_bounces): raygen, every bounce, the
    # accumulator update AND the per-chunk key folds as ONE jitted
    # program per chunk — the round-5 single-dispatch lever.  Beyond
    # dispatch count, the win is HBM traffic: the chained path writes the
    # full PathState (~15 arrays x chunk rays) to HBM between programs,
    # the fused program streams rays end-to-end (measured on the grad
    # side: the fused fwd+bwd beat the 3-dispatch forward chain,
    # docs/perf.md round-5 table).  PRNG derivations are identical to
    # the chained path (the fold_in/split calls move in-program
    # unchanged), so images match to float-fusion ulps.
    fuse_whole_pass = (span == cfg.num_bounces
                       and cfg.compact_from_bounce is None)

    def fused_chunk_fn(arrays, nc, acc, key, ci):
        _, k_path = jax.random.split(key)
        k_chunk = jax.random.fold_in(k_path, ci)
        state = raygen_fn(nc, jax.random.fold_in(key, ci))
        for b in range(cfg.num_bounces):
            state = bounce_fn(arrays, state, k_chunk, b)
        return accumulate_fn(state.acc, acc, ci)

    fused_chunk = None
    if mesh is None:
        raygen = jax.jit(raygen_fn)
        bounce = jax.jit(bounce_span_fn, donate_argnums=(1,))
        bounce_compact = jax.jit(bounce_compact_fn, donate_argnums=(1,))
        accumulate = jax.jit(accumulate_fn, donate_argnums=(1,))
        if fuse_whole_pass:
            fused_chunk = jax.jit(fused_chunk_fn, donate_argnums=(2,))
    else:
        bounce_compact = None  # mesh path never compacts (see one_pass)

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import RAY_AXIS

        ray_p = P(RAY_AXIS)
        state_p = integrator.PathState(
            o=Vec3(ray_p, ray_p, ray_p),
            d=Vec3(ray_p, ray_p, ray_p),
            acc=Vec3(ray_p, ray_p, ray_p),
            refl=Vec3(ray_p, ray_p, ray_p),
            alive=ray_p,
        )

        def raygen_shard(nc, key):
            # decorrelate per-device lens streams
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            return raygen_fn(nc, key)

        def bounce_shard(arrays, state, key, b0):
            # the axis fold is deterministic, so folding once for the whole
            # span draws the same per-bounce streams as folding per bounce
            key = jax.random.fold_in(key, jax.lax.axis_index(RAY_AXIS))
            return bounce_span_fn(arrays, state, key, b0)

        raygen = jax.jit(
            jax.shard_map(
                raygen_shard, mesh=mesh,
                in_specs=(Vec2(ray_p, ray_p), P()), out_specs=state_p,
                check_vma=False,
            )
        )
        bounce = jax.jit(
            jax.shard_map(
                bounce_shard, mesh=mesh,
                in_specs=(P(), state_p, P(), P()), out_specs=state_p,
                check_vma=False,
            ),
            donate_argnums=(1,),
        )
        acc_p = P(None, RAY_AXIS)
        accumulate = jax.jit(
            jax.shard_map(
                accumulate_fn, mesh=mesh,
                in_specs=(Vec3(ray_p, ray_p, ray_p), Vec3(acc_p, acc_p, acc_p), P()),
                out_specs=Vec3(acc_p, acc_p, acc_p),
                check_vma=False,
            ),
            donate_argnums=(1,),
        )
        if fuse_whole_pass:
            def fused_chunk_shard(arrays, nc, acc, key, ci):
                # same per-device stream decorrelation as raygen_shard /
                # bounce_shard: fold the axis index into each derived key
                ax = jax.lax.axis_index(RAY_AXIS)
                _, k_path = jax.random.split(key)
                k_chunk = jax.random.fold_in(
                    jax.random.fold_in(k_path, ci), ax)
                kr = jax.random.fold_in(jax.random.fold_in(key, ci), ax)
                state = raygen_fn(nc, kr)
                for b in range(cfg.num_bounces):
                    state = bounce_fn(arrays, state, k_chunk, b)
                return accumulate_fn(state.acc, acc, ci)

            fused_chunk = jax.jit(
                jax.shard_map(
                    fused_chunk_shard, mesh=mesh,
                    in_specs=(P(), Vec2(ray_p, ray_p),
                              Vec3(acc_p, acc_p, acc_p), P(), P()),
                    out_specs=Vec3(acc_p, acc_p, acc_p),
                    check_vma=False,
                ),
                donate_argnums=(2,),
            )

    # stream compaction (single-chip only; SPMD shards need one shape —
    # per-device live counts diverge, so the mesh path keeps masking)
    do_compact = cfg.compact_from_bounce is not None and mesh is None

    # multi-host: this process renders only its stride of the chunk list
    # (absolute chunk indices keep the RNG streams identical, so the union
    # over processes equals the single-process render); the accumulator
    # rows of foreign chunks stay zero and cross_process_sum unions them
    # at snapshot/finalize (parallel/distributed.py)
    from ..parallel.distributed import local_chunk_ids

    chunk_ids = local_chunk_ids(num_chunks)

    def one_pass(arrays, acc: Vec3, key) -> Vec3:
        from ..ops import compaction

        if fused_chunk is not None:
            # single dispatch per chunk; ci rides as a traced scalar so
            # one compiled program serves every chunk
            for ci in chunk_ids:
                acc = fused_chunk(arrays, nc_chunks[ci], acc, key,
                                  jnp.int32(ci))
            return acc

        _, k_path = jax.random.split(key)
        for ci in chunk_ids:
            # decorrelate the per-chunk random streams
            k_chunk = jax.random.fold_in(k_path, ci)
            state = raygen(nc_chunks[ci], jax.random.fold_in(key, ci))
            acc_bank = None
            src = None
            for b in range(cfg.num_bounces):
                if do_compact and b == cfg.compact_from_bounce and src is None:
                    # one scalar d2h sync per chunk: pick the bucket
                    n_alive = int(compaction.count_alive(state.alive))
                    if n_alive == 0:
                        break  # nothing left to shade; acc is final
                    m = compaction.pick_bucket(n_alive, chunk)
                    if m is not None:
                        acc_bank = state.acc
                        state, src = compaction.compact_state(state, m)
                if src is None:
                    if b % span:
                        continue   # handled by the span program
                    state = bounce(arrays, state, k_chunk, b)
                else:
                    state = bounce_compact(arrays, state, k_chunk, b, src)
            rad = (
                state.acc
                if src is None
                else compaction.scatter_acc(acc_bank, state.acc, src)
            )
            acc = accumulate(rad, acc, ci)
        return acc

    return one_pass, (num_chunks, chunk_pixels)


def _finalize_fn(cfg: RenderConfig):
    n = cfg.width * cfg.height

    def fin(acc: Vec3, sampling):
        img = Vec3(
            acc.x.reshape(-1)[:n].reshape(cfg.height, cfg.width),
            acc.y.reshape(-1)[:n].reshape(cfg.height, cfg.width),
            acc.z.reshape(-1)[:n].reshape(cfg.height, cfg.width),
        )
        return finalize_image(img, sampling, cfg)

    return jax.jit(fin)


class ProgressiveRenderer:
    def __init__(
        self,
        cs: CompiledScene,
        cfg: RenderConfig,
        out_dir: str = ".",
        tee: Optional[Tee] = None,
        lens_shape: str = "circle",
        mesh=None,
        checkpoint_path: Optional[str] = None,
    ) -> None:
        # with a checkpoint_path, renderer state is persisted at every
        # snapshot interval (crash-safe: a killed render resumes from the
        # last interval, not from zero) and on finish
        self.checkpoint_path = checkpoint_path
        self.cs = cs
        self.cfg = cfg
        self.out_dir = out_dir
        self.tee = tee or Tee(None)
        self.arrays = jax.tree.map(jnp.asarray, cs.arrays)
        self._pass, acc_shape = _pass_fn(cs, cfg, lens_shape, mesh=mesh)
        self._finalize = _finalize_fn(cfg)
        dt = jnp.float32 if cfg.dtype == "float32" else jnp.float64
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS

            sh = NamedSharding(mesh, P(None, RAY_AXIS))
            mk = lambda: jax.device_put(jnp.zeros(acc_shape, dt), sh)
        else:
            mk = lambda: jnp.zeros(acc_shape, dt)
        self.acc = Vec3(mk(), mk(), mk())
        self.sampled = 0
        self._image_counter = 0

    def _gathered_acc(self) -> Vec3:
        """The full-frame accumulator: all-gather over the local mesh,
        then union the disjoint per-process chunk rows over DCN
        (collective — every process calls this together)."""
        acc = self.acc
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            acc = Vec3(*(jax.device_put(c, rep) for c in acc))
        if jax.process_count() > 1:
            from ..parallel.distributed import cross_process_sum

            acc = Vec3(*(cross_process_sum(c) for c in acc))
        return acc

    # -- checkpoint / resume ------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Atomic write (tmp + rename): a crash mid-write never corrupts
        the previous checkpoint.  Multi-process: each process saves its
        own partial accumulator (give each host its own path) and must
        resume with the same process count."""
        tmp = path + ".tmp.npz"
        np.savez(
            tmp,
            acc_x=fetch_image(self.acc.x),
            acc_y=fetch_image(self.acc.y),
            acc_z=fetch_image(self.acc.z),
            sampled=self.sampled,
            seed=self.cfg.seed,
            # geometry keys so a checkpoint is self-describing — the
            # split golden pipeline (tools/golden_finalize_cpu.py)
            # finalizes these npz files on the CPU backend
            width=self.cfg.width,
            height=self.cfg.height,
        )
        os.replace(tmp, path)

    def load_checkpoint(self, path: str) -> None:
        """Restore accumulator + pass counter.  Under a mesh the loaded
        accumulator is re-placed with the renderer's ray-axis sharding
        (a plain jnp.asarray would silently replicate it and every
        donate-sharded pass would then re-layout)."""
        d = np.load(path)
        assert int(d["seed"]) == self.cfg.seed, "checkpoint seed mismatch"
        acc = Vec3(
            jnp.asarray(d["acc_x"]), jnp.asarray(d["acc_y"]), jnp.asarray(d["acc_z"])
        )
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import RAY_AXIS

            sh = NamedSharding(self._mesh, P(None, RAY_AXIS))
            acc = Vec3(*(jax.device_put(c, sh) for c in acc))
        self.acc = acc
        self.sampled = int(d["sampled"])

    # -- main loop ----------------------------------------------------------
    def render(self) -> RenderResult:
        cfg = self.cfg
        tee = self.tee
        begin = time.monotonic()
        last_pass_sec = 0.0
        last_report_image = begin
        key = jax.random.PRNGKey(cfg.seed)

        total_rays = 0
        ss2 = cfg.rays_per_pixel_per_pass
        rays_per_pass = cfg.width * cfg.height * ss2
        if jax.process_count() > 1:
            # this process renders only its stride of the chunks
            from ..parallel.distributed import local_chunk_ids

            nch = self.acc.x.shape[0]
            rays_per_pass = rays_per_pass * len(local_chunk_ids(nch)) // nch

        # NOTE: sampling is 1-origin like the reference (renderer.rs:31)
        while self.sampled < cfg.sampling:
            sampling = self.sampled + 1
            t0 = time.monotonic()
            self.acc = self._pass(
                self.arrays, self.acc, jax.random.fold_in(key, sampling)
            )
            jax.block_until_ready(self.acc.x)
            now = time.monotonic()
            last_pass_sec = now - t0
            self.sampled = sampling
            total_rays += rays_per_pass

            used = now - begin
            used_percent = used / cfg.time_limit_sec * 100.0
            tee(
                f"rendering: {sampling}x{ss2} sampled (last {last_pass_sec:.3f} sec). "
                f"total: {used:.3f} sec ({used_percent:.2f} %)."
            )

            # predictive time-limit stop (renderer.rs:217-226); collective
            # so hosts with drifting clocks stop on the same pass
            if agree_stop(used + last_pass_sec * 1.1 > cfg.time_limit_sec):
                tee("reached time limit")
                self._save_numbered(final=True, used=used)
                break

            if sampling >= cfg.sampling:
                tee("reached max sampling")
                self._save_numbered(final=True, used=used)
                break

            if agree_snapshot(
                now - last_report_image >= cfg.report_interval_sec
            ):
                self._save_numbered(final=False, used=used)
                if self.checkpoint_path:
                    self.save_checkpoint(self.checkpoint_path)
                last_report_image = now

        seconds = time.monotonic() - begin
        image = fetch_image(self._finalize(self._gathered_acc(), self.sampled))
        if is_primary():
            save_png(os.path.join(self.out_dir, "result.png"), image)
        rays = total_rays
        return RenderResult(
            image=image,
            sampled=self.sampled,
            seconds=seconds,
            rays_per_sec=rays / max(seconds, 1e-9),
        )

    def _save_numbered(self, final: bool, used: float) -> None:
        path = os.path.join(self.out_dir, f"{self._image_counter:03d}.png")
        if final:
            self.tee(f"output final image: {path}")
            self.tee(f"remain: {self.cfg.time_limit_sec - used:.3f} sec.")
        else:
            self.tee(f"output progress image: {path}")
        t0 = time.monotonic()
        image = fetch_image(self._finalize(self._gathered_acc(), self.sampled))
        self.tee(f"update_imgbuf: {time.monotonic() - t0:.3f} sec")
        if is_primary():
            save_png(path, image)
        if not final:
            self._image_counter += 1


def render_debug(
    cs: CompiledScene,
    cfg: RenderConfig,
    mode: str = "focal_plane",
    out_dir: str = ".",
    tee: Optional[Tee] = None,
) -> RenderResult:
    """Single-pass debug render (reference: renderer.rs:101-146), through
    the same tonemap/filter output path (renderer.rs:141-145)."""
    tee = tee or Tee(None)
    arrays = jax.tree.map(jnp.asarray, cs.arrays)
    nc = normalized_coords(cfg.width, cfg.height, cfg.supersampling)
    ss2 = cfg.rays_per_pixel_per_pass

    @jax.jit
    def run(arrays):
        rad = integrator.debug_pass(arrays, cs.camera, nc, mode)

        def pix(v):
            return v.reshape(-1, ss2).sum(axis=1).reshape(cfg.height, cfg.width)

        img = Vec3(pix(rad.x), pix(rad.y), pix(rad.z))
        return finalize_image(img, 1, cfg)

    t0 = time.monotonic()
    image = fetch_image(run(arrays))
    seconds = time.monotonic() - t0
    save_png(os.path.join(out_dir, "result.png"), image)
    rays = cfg.width * cfg.height * ss2
    return RenderResult(image=image, sampled=1, seconds=seconds, rays_per_sec=rays / seconds)
