#!/usr/bin/env python
"""A/B the two large-table gather adjoints on the current backend.

The backward pass of a texture fetch accumulates per-tap cotangents into
the texel grid.  ops/dgather.py offers two formulations:

  scatter  zeros(T).at[idx].add(ct)          (XLA's native adjoint)
  sort     lax.sort + cumsum + two unique-index scatters
           (sorted_segment_add)

This tool times both at renderer-realistic sizes (taps = 4 per ray per
fetch, tables = the rtcamp6 atlas/skybox plane sizes) plus the forward
gather for scale.  Prints one JSON line per case; no device->host
transfers beyond scalar timings (block_until_ready only).

Usage: python tools/scatter_bench.py [--platform cpu] [--rays 2097152]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[9_000_000, 6 * 1024 * 1024])
    args = ap.parse_args()

    import jax

    from hanamaru_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hanamaru_tpu.ops.dgather import sorted_segment_add

    n_taps = 4 * args.rays
    key = jax.random.PRNGKey(0)

    def timed(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps

    for size in args.sizes:
        k1, k2 = jax.random.split(jax.random.fold_in(key, size))
        idx = jax.random.randint(k1, (n_taps,), 0, size, jnp.int32)
        cts = tuple(
            jax.random.uniform(jax.random.fold_in(k2, c), (n_taps,))
            for c in range(3)
        )
        table = jnp.zeros((size,), jnp.float32)

        @jax.jit
        def fwd_gather(idx, table):
            return tuple(table[idx] for _ in range(3))

        @jax.jit
        def adj_scatter(idx, cts):
            return tuple(
                jnp.zeros((size,), jnp.float32).at[idx].add(ct) for ct in cts
            )

        @jax.jit
        def adj_sort(idx, cts):
            return sorted_segment_add(idx, cts, size)

        res = {
            "size": size,
            "taps": n_taps,
            "fwd_gather_secs": round(timed(fwd_gather, idx, table), 5),
            "adj_scatter_secs": round(timed(adj_scatter, idx, cts), 5),
            "adj_sort_secs": round(timed(adj_sort, idx, cts), 5),
        }
        res["sort_over_scatter"] = round(
            res["adj_sort_secs"] / max(res["adj_scatter_secs"], 1e-9), 3
        )
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
