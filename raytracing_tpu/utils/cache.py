"""Persistent XLA compilation cache for the remote-TPU workflow.

Cold Mosaic/XLA compiles through the single-lane axon tunnel cost minutes
(400+ s measured for the eigenray pipeline, benchmarks/logs_r4/15); the
reference pays nothing comparable because CUDA kernels are pre-built.
JAX's persistent compilation cache closes that gap across *processes*:
measured on this tunnel, a second process re-running the same program
loads the serialized executable in ~10 ms instead of recompiling.

``enable_persistent_cache()`` is called by the entry points that pay
repeated compiles — bench.py, __graft_entry__.py, the serve daemon, and
the benchmark probes.  It is a no-op when ``RT_NO_CACHE=1`` (for honest
cold-compile measurements) or when the config knobs are unavailable.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at ``path`` (default: repo-local).

    Returns the cache dir actually set, or None if disabled/unavailable.
    Safe to call multiple times and before/after backend init; caches are
    keyed by backend + program, so CPU test runs and TPU bench runs
    coexist in one directory.
    """
    if os.environ.get("RT_NO_CACHE", "0") == "1":
        return None
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: tunnel round-trips make even small compiles
        # worth persisting
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without the knobs — run uncached
        return None
    os.makedirs(cache_dir, exist_ok=True)
    return cache_dir
