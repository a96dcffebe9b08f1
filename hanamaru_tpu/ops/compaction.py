"""Stream compaction for the wavefront bounce loop.

The reference's per-pixel recursion (reference: src/renderer.rs:174) has
no dead-lane problem — each CPU thread just exits its loop.  The wavefront
formulation keeps terminated rays in their vector lanes; past the first
few bounces most lanes are dead (they escaped to the skybox) but still pay
full vector cost in every intersect/shade dispatch.  Compaction gathers
the live rays into a shorter prefix and runs the remaining bounces on
that, trading one stable partition + gather for ~1/live_fraction speedup
of the tail bounces.

Bit-exactness contract: per-lane randoms everywhere in the integrator are
keyed by *original* lane id (integrator._uniform_pair lane_ids), so a
compacted run produces exactly the radiance of the masked run — compaction
is purely a scheduling decision, verified lane-for-lane in
tests/test_compaction.py.

Shapes stay static: the host picks the prefix length m from a fixed
bucket list (chunk/2, /4, /8) after fetching the live count (one scalar
device->host sync per chunk at the compaction bounce), so at most three
extra program compilations exist per chunk size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.vec import Vec3
from .integrator import PathState


def alive_partition(alive: jax.Array) -> jax.Array:
    """Stable partition permutation: indices of all lanes, live lanes
    first, original order preserved within each class (cumsum-based, no
    sort)."""
    n = alive.shape[0]
    alive_i = alive.astype(jnp.int32)
    pos_alive = jnp.cumsum(alive_i) - 1
    n_alive = pos_alive[-1] + 1
    pos_dead = jnp.cumsum(1 - alive_i) - 1 + n_alive
    pos = jnp.where(alive, pos_alive, pos_dead)        # lane i -> slot pos[i]
    return jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))


@jax.jit
def count_alive(alive: jax.Array) -> jax.Array:
    return jnp.sum(alive, dtype=jnp.int32)


def _gather3(v: Vec3, idx) -> Vec3:
    return Vec3(v.x[idx], v.y[idx], v.z[idx])


@functools.partial(jax.jit, static_argnames=("m",), donate_argnums=())
def compact_state(state: PathState, m: int) -> tuple[PathState, jax.Array]:
    """Gather the live-first prefix of length `m` into a fresh PathState.

    Returns (compacted state, src_idx): src_idx[j] is the original lane of
    compact lane j.  The compact state's `acc` starts at zero — the caller
    banks the full-size acc and scatter-adds the compact acc back at the
    end (`scatter_acc`).  Requires m >= live count (the caller picks the
    bucket from the fetched count); dead lanes inside the prefix behave
    exactly as they did in the full batch.
    """
    perm = alive_partition(state.alive)
    src = perm[:m]
    zero = jnp.zeros((m,), state.o.x.dtype)
    return (
        PathState(
            o=_gather3(state.o, src),
            d=_gather3(state.d, src),
            acc=Vec3(zero, zero, zero),
            refl=_gather3(state.refl, src),
            alive=state.alive[src],
        ),
        src,
    )


@jax.jit
def scatter_acc(acc_full: Vec3, acc_m: Vec3, src_idx: jax.Array) -> Vec3:
    """Add the compact lanes' radiance back into full lane space."""
    return Vec3(
        acc_full.x.at[src_idx].add(acc_m.x),
        acc_full.y.at[src_idx].add(acc_m.y),
        acc_full.z.at[src_idx].add(acc_m.z),
    )


def pick_bucket(n_alive: int, chunk: int, granule: int = 1) -> int | None:
    """Smallest bucket in {chunk/2, chunk/4, chunk/8} that holds all live
    lanes (rounded up to `granule`); None when the batch is still too full
    for compaction to pay."""
    best = None
    for div in (2, 4, 8):
        m = chunk // div
        m -= m % granule
        if m >= max(n_alive, granule):
            best = m
    return best
