"""Persistent XLA compile cache setup — shared by the CLI and benches.

Capability/measurement support (DESIGN.md §8, BASELINE.md r2): batch-64
device programs compile in 10-50 minutes over this build box's tunneled
chip; jax's persistent compilation cache makes repeat runs of an unchanged
program near-instant and was verified working through the tunnel. One
helper so the four entry points (cli, bench, bench_eval, bench_train)
cannot drift.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]

DEFAULT_DIR = "/tmp/eov_jax_cache"


def enable_compile_cache(default_dir: str = DEFAULT_DIR) -> str | None:
    """Point jax at a persistent compile cache; returns the dir or None.

    ``JAX_COMPILATION_CACHE_DIR`` overrides the location; set it to the
    empty string to disable. Failures are swallowed — the cache is purely
    an optimization.
    """
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir)
    if not cache_dir:
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        return None
    return cache_dir
