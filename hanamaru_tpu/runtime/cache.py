"""Persistent XLA compilation cache setup.

First jit compiles over this environment's TPU relay cost 15-25 s per
program (docs/perf.md) and the remote compile service is the single most
crash-prone step on degraded relay days — but the standard JAX
persistent cache works through the plugin (verified 2026-08-21: a fresh
process re-loads a cached 1080p render program in ~0 s, and a 64-pass
1080p render that previously spent minutes compiling ran its passes in
9.9 s).  Every entry point (CLI, bench.py, tools) therefore enables it.

The cache directory comes from $JAX_COMPILATION_CACHE_DIR when set
(JAX's own convention), else a stable per-machine default under /tmp so
separate processes — including the benchmark driver — share warm
programs.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/hanamaru_jax_cache"


def enable_persistent_cache() -> str:
    """Idempotently point jax at a persistent compilation cache.

    Must run before the first compilation (any time after `import jax`).
    Returns the cache directory in use."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took meaningful compile time; tiny programs
    # recompile faster than they deserialize
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
