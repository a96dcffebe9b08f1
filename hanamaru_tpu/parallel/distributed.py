"""Multi-host launch helpers.

The reference is strictly single-process (SURVEY.md §2: rayon threads in
shared memory).  The TPU build scales across hosts with jax.distributed:
every host runs the same progressive loop on its pod-slice chips; ray
chunks are disjoint per process, parameter gradients psum over ICI+DCN,
and only host 0 assembles/saves images.

Usage (one command per host):

    python -m hanamaru_tpu ... --coordinator HOST0:1234 \
        --process-id K --num-processes N
"""
from __future__ import annotations

import jax


def initialize(
    coordinator: str | None,
    process_id: int | None = None,
    num_processes: int | None = None,
) -> None:
    """Initialize jax.distributed when a coordinator address is given.

    No-op for single-host runs, so the same entry point serves both."""
    if not coordinator:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def local_ray_slice(total_rays: int) -> tuple[int, int]:
    """[start, stop) of the ray axis owned by this process (equal split)."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-total_rays // n)
    start = i * per
    return start, min(start + per, total_rays)
