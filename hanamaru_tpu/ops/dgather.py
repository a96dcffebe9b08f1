"""Differentiable table gathers with TPU-shaped adjoints.

The renderer reads every differentiable scene table through batched
gathers (material channels by ``mat_id``, texture/skybox texels by flat
tap index).  The autodiff adjoint of a gather is a scatter-add, and on
TPU an N-update scatter with colliding indices serializes — XLA applies
the updates one at a time.  With N in the millions per bounce, those
scatters (not the differentiable math) dominated the round-2 backward
pass (docs/perf.md: fwd+bwd ~43x a forward pass on chip).

This module re-expresses the adjoints in forms the hardware runs well
(the forward gathers are unchanged — same indices, same values):

``gather_tables``
    Small tables (materials: tens of entries).  The adjoint is a one-hot
    matmul: ``[N,K] one-hot  x  [N,C] cotangents -> [K,C]`` — an MXU
    contraction in f32 instead of N serialized updates.  Exact (f32
    accumulation; term order differs from a scatter's, as any
    parallel reduction's does).

``gather_texels``
    Large flat tables (texture atlas / skybox: millions of texels).  Two
    selectable adjoints (``TEXEL_ADJOINT``):

    * ``"sort"`` (default): sort the tap indices (one ``lax.sort`` with
      the per-channel cotangents as payloads), segment-sum runs of equal
      indices via cumsum differences, and write each run's total with a
      scatter whose kept indices are **unique** (``unique_indices=True``,
      sentinel-dropped elsewhere) — which XLA runs parallel.
    * ``"scatter"``: the plain ``.at[idx].add`` adjoint (XLA default),
      kept for A/B measurement (tools/scatter_bench.py).

Reference parity note: the reference renderer (Rust, forward-only) has
no analogue — gradients are a capability this framework adds on top of
src/texture.rs:22-63 / src/material.rs sampling semantics.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as _jdt

# Adjoint used for large-table (texel) gathers: "sort" | "scatter" |
# "auto".  Read at trace time; a jitted program keeps the mode it was
# traced with.  "auto" picks by backend: XLA CPU's scatter-add is fast
# (vectorized) while its sort is serial — and vice versa on TPU, where a
# colliding N-update scatter serializes but lax.sort vectorizes
# (measured: tools/scatter_bench.py, docs/perf.md).
TEXEL_ADJOINT = "auto"


def _texel_adjoint_mode() -> str:
    if TEXEL_ADJOINT != "auto":
        return TEXEL_ADJOINT
    return "scatter" if jax.default_backend() == "cpu" else "sort"

# One-hot matmul memory guard: N*K f32 for the one-hot operand.  Above
# this, the backward falls back to the plain scatter adjoint (correct,
# just not MXU-shaped); K beyond a few hundred is outside this
# renderer's material-count regime anyway.
_ONEHOT_MAX_ELEMS = 1 << 28     # 1 GiB of f32


@jax.custom_vjp
def gather_tables(idx, tables):
    """``tuple(t[idx] for t in tables)`` for small 1-D float tables.

    All tables share length K and the [N] int index.  Backward computes
    d/dtables as a single one-hot matmul over every channel at once.
    """
    return tuple(t[idx] for t in tables)


def _gather_tables_fwd(idx, tables):
    return gather_tables(idx, tables), (
        idx, tuple(int(t.shape[0]) for t in tables)
    )


def _gather_tables_bwd(res, cts):
    idx, k_static = res
    (k,) = set(k_static)
    n = idx.shape[0]
    ct_mat = jnp.stack(cts, axis=1)                       # [N, C]
    if n * k <= _ONEHOT_MAX_ELEMS:
        onehot = (idx[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :])
        grads = jax.lax.dot_general(
            onehot.astype(ct_mat.dtype), ct_mat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [K, C]
        outs = tuple(grads[:, c] for c in range(ct_mat.shape[1]))
    else:
        outs = tuple(
            jnp.zeros((k,), ct.dtype).at[idx].add(ct) for ct in cts
        )
    return np.zeros(idx.shape, _jdt.float0), outs


gather_tables.defvjp(_gather_tables_fwd, _gather_tables_bwd)


def sorted_segment_add(idx, cts: Sequence[jax.Array], size: int):
    """Equivalent of ``zeros(size).at[idx].add(ct)`` per channel, built
    from one sort + cumsum + two unique-index scatters.

    ``idx`` [M] int32 (values in [0, size)), ``cts`` channels [M] float.
    Term order inside a segment is the sorted order (an f32 cumsum
    difference), so results match a scatter to f32 reduction tolerance.
    """
    if idx.shape[0] == 0:
        # concatenate([ones(1,bool), empty]) below would yield shape (1,)
        # against a zero-length s_idx and crash jnp.where (advisor
        # finding, round 3); an empty scatter is just zeros
        return tuple(jnp.zeros((size,), ct.dtype) for ct in cts)
    sorted_ops = jax.lax.sort((idx,) + tuple(cts), num_keys=1)
    s_idx, s_cts = sorted_ops[0], sorted_ops[1:]
    neighbor_diff = s_idx[1:] != s_idx[:-1]
    true1 = jnp.ones((1,), bool)
    is_start = jnp.concatenate([true1, neighbor_diff])
    is_end = jnp.concatenate([neighbor_diff, true1])
    # sentinel `size` is dropped by mode="drop"; kept indices are unique
    # (one per run of equal values), so XLA may scatter in parallel
    idx_end = jnp.where(is_end, s_idx, size)
    idx_start = jnp.where(is_start, s_idx, size)
    outs = []
    for ct in s_cts:
        csum = jnp.cumsum(ct)
        ends = jnp.zeros((size,), ct.dtype).at[idx_end].set(
            csum, mode="drop", unique_indices=True
        )
        starts = jnp.zeros((size,), ct.dtype).at[idx_start].set(
            csum - ct, mode="drop", unique_indices=True
        )
        outs.append(ends - starts)
    return tuple(outs)


@jax.custom_vjp
def gather_texels(idx, tables):
    """``tuple(t[idx] for t in tables)`` for large flat float tables
    (texture atlas / skybox planes, flattened).  Tables share one size;
    ``idx`` is any shape of int32 (tap indices, already clamped in
    range).  Backward per TEXEL_ADJOINT (module docstring)."""
    return tuple(t[idx] for t in tables)


def _gather_texels_fwd(idx, tables):
    return gather_texels(idx, tables), (
        idx,
        tuple(int(t.shape[0]) for t in tables),
    )


def _gather_texels_bwd(res, cts):
    idx, sizes = res
    # module flag read when the backward is traced; a compiled program
    # keeps the mode it was traced with
    mode = _texel_adjoint_mode()
    (size,) = set(sizes)
    flat_idx = idx.reshape(-1)
    flat_cts = tuple(ct.reshape(-1) for ct in cts)
    if mode == "sort":
        outs = sorted_segment_add(flat_idx, flat_cts, size)
    else:
        outs = tuple(
            jnp.zeros((size,), ct.dtype).at[flat_idx].add(ct)
            for ct in flat_cts
        )
    return np.zeros(idx.shape, _jdt.float0), outs


gather_texels.defvjp(_gather_texels_fwd, _gather_texels_bwd)
