"""Persistent XLA compilation cache setup.

TPU compiles of the build/trace pipelines take tens of seconds; the cache
makes every process after the first start instantly. Call once at program
start (bench.py, the CLI, and __graft_entry__ all do).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HAGRID_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: caching is best-effort
