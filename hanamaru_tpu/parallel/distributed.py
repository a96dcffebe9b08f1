"""Multi-host launch helpers.

The reference is strictly single-process (SURVEY.md §2: rayon threads in
shared memory).  The TPU build scales across hosts with jax.distributed:
every host runs the same progressive loop, ray chunks are stride-
partitioned by process (`local_chunk_ids`), each host accumulates only its
own chunks' rows, and the full framebuffer exists only where it is needed
— `cross_process_sum` unions the disjoint partial accumulators over DCN at
snapshot/finalize time, and only host 0 writes images.

Wall-clock decisions (predictive time-limit stop, snapshot intervals) are
made collectively (`agree_stop` / `agree_snapshot`): hosts' clocks drift,
and a divergent decision would deadlock the next collective.

Usage (one command per host):

    python -m hanamaru_tpu ... --coordinator HOST0:1234 \
        --process-id K --num-processes N
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def local_chunk_ids(
    num_chunks: int,
    process_id: int | None = None,
    num_processes: int | None = None,
) -> list[int]:
    """Ray-chunk indices owned by this process (stride partition).

    Chunks keep their absolute index for RNG folding, so the union of all
    processes' accumulators equals the single-process render exactly."""
    p = num_processes if num_processes is not None else jax.process_count()
    i = process_id if process_id is not None else jax.process_index()
    return list(range(i, num_chunks, p))


def _allgather_np(x: np.ndarray) -> np.ndarray:
    """Gather a host-local numpy array from every process -> [P, ...]."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(x)))


def cross_process_sum(x) -> jax.Array:
    """Union the disjoint per-process partial accumulators (collective —
    every process must call).  No-op single-process."""
    if jax.process_count() == 1:
        return x
    return jnp.asarray(_allgather_np(np.asarray(x)).sum(axis=0))


def agree_stop(local: bool) -> bool:
    """Collective OR: if any host wants to stop, all stop (keeps later
    collectives aligned).  No-op single-process."""
    if jax.process_count() == 1:
        return local
    return bool(_allgather_np(np.asarray([local])).any())


def agree_snapshot(local: bool) -> bool:
    """Snapshot when host 0 wants one — all hosts must join the gather
    that builds the image, so the decision must be uniform."""
    if jax.process_count() == 1:
        return local
    return bool(_allgather_np(np.asarray([local]))[0, 0])
