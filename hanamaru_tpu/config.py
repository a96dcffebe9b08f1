"""Global render configuration.

TPU-native counterpart of the reference's two config tiers:
compile-time constants (reference: src/config.rs:4-25) and the CLI flags
(reference: src/main.rs:1230-1256).  Here both live in one dataclass so a
render is fully described by data, not by a code edit.
"""
from __future__ import annotations

import dataclasses
import math


# ---------------------------------------------------------------------------
# numeric constants (reference: src/config.rs:4-9)
# ---------------------------------------------------------------------------
PI = math.pi
PI2 = 2.0 * math.pi
EPS = 1e-4
OFFSET = 1e-4          # ray self-intersection offset (config.rs:8)
# The reference uses 1e100 as "infinity" (config.rs:9).  That overflows f32,
# so the device-side "no hit yet" distance is a large finite f32.
INF = 1e30

GAMMA_FACTOR = 2.2     # config.rs:11


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """One render = one RenderConfig + one scene name."""

    # image / sampling (main.rs:1249-1256 defaults)
    width: int = 1920
    height: int = 1080
    sampling: int = 1000           # progressive pass limit
    time_limit_sec: float = 123.0  # rtcamp6 regulation
    report_interval_sec: float = 15.0

    # per-pass supersampling grid (config.rs:13): 2x2 = 4 rays/pixel/pass
    supersampling: int = 2

    # path tracing (config.rs:14): loop `1..10` = 9 bounces
    bounce_limit: int = 10

    # tone mapping (config.rs:17-19)
    tonemap_mode: str = "reinhard"       # "none" | "reinhard"
    tonemap_exposure: float = 1.5
    tonemap_white_point: float = 20.0

    # bilateral-filter denoise (config.rs:22-25)
    bilateral_iterations: int = 1
    bilateral_diameter: int = 3
    bilateral_sigma_i: float = 1.0
    bilateral_sigma_s: float = 16.0
    # The reference's filter underflows u32 at image edges (filter.rs:43-44);
    # default here is correct clamping, flip for bug-parity renders.
    bilateral_reference_edge_bug: bool = False

    # integrator behavior
    # The reference has no MIS: NEE adds direct light at vertex k while the
    # BSDF continuation still adds emission at vertex k+1 (renderer.rs:196,
    # see SURVEY.md §3.4).  "reference" reproduces that; "nee_clamp" masks the
    # BSDF-hit emission on NEE-able vertices.
    direct_light_mode: str = "reference"

    # rng
    seed: int = 8700304            # reference's base seed (renderer.rs:167)
    # Reuse one uniform pair per bounce for both the BSDF sample and every
    # NEE light sample, exactly like renderer.rs:175,183.  Default draws
    # independent pairs (same marginals; see ops/integrator.py docstring).
    strict_reference_rng: bool = False

    # device precision ("float32" on TPU; CPU oracle tests may use float64)
    dtype: str = "float32"

    # rays per device dispatch: a progressive pass is processed in chunks
    # of at most this many rays.  2^23 covers a full 1080p x 2x2 frame in
    # one dispatch (fastest: ~2.6 ms/pass on one v5e chip); the chunking
    # bounds the working set for larger frames and is the natural unit for
    # multi-chip sharding.
    max_rays_per_chunk: int = 1 << 23

    # stream compaction (SURVEY.md §7.5 hard part (d)): at this bounce the
    # host loop partitions live rays to the front and continues the
    # remaining bounces on a shorter prefix (one of chunk/2, chunk/4,
    # chunk/8 — static shapes, so at most 3 extra compilations).  Randoms
    # stay keyed by original lane id, so results are bit-identical to the
    # dead-lane-masked loop.  None disables (single-chip only; the mesh
    # path always uses dead-lane masking — per-device live counts diverge
    # and SPMD needs one shape).  See docs/perf.md for measurements.
    compact_from_bounce: int | None = None

    # forward bounces fused per device dispatch.  The bounce loop is
    # host-driven (one compiled step per call); on a TPU reached through
    # a serializing relay each dispatch costs ~0.2-0.5 ms of latency, so
    # fusing k bounces into one program divides the per-pass dispatch
    # count by ~k (9 bounces: 11 -> 5 dispatches/pass at span 3).  Used
    # when it divides num_bounces and stream compaction is off (the
    # compaction decision point needs per-bounce host control).  Pure
    # unrolling of the same step: bit-identical images.  When the span
    # covers ALL bounces, the whole pass (raygen + bounces + accumulate
    # + key folds) fuses into a single program per chunk — fewer
    # dispatches AND no inter-program PathState round-trips through HBM
    # (runtime/progressive.py).  -1 opts into that full fusion
    # (num_bounces on accelerators, span 3 on CPU whose compiler only
    # slows down on the unroll); it is NOT the default because the one
    # full-fusion render loop driven on this environment's relay
    # crashed the TPU worker (2026-08-21 22:28, docs/perf.md round-5
    # golden-attempt log) — image-identical by the fused-vs-chained
    # test, so re-try it on a TPU not behind this relay.
    bounce_span: int = 3

    # BVH traversal backend: "xla" (per-ray lockstep while_loop — the
    # production path for every ray class; docs/perf.md has the measured
    # dispatch-policy justification) or "pallas" (tile-uniform Mosaic
    # kernel, TPU only; identical hits but ~250x slower than the lockstep
    # walk even on coherent batches); "pallas_interpret" runs the kernel
    # in interpret mode for CPU tests.
    traversal: str = "xla"

    @property
    def rays_per_pixel_per_pass(self) -> int:
        return self.supersampling * self.supersampling

    @property
    def num_bounces(self) -> int:
        # reference: `for _ in 1..PATHTRACING_BOUNCE_LIMIT` (renderer.rs:174)
        return self.bounce_limit - 1
