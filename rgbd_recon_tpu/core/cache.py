"""Persistent XLA compilation cache setup.

First-time compiles of the fused pipeline programs take minutes through the
remote-compile transport of tunneled TPU devices (281 s measured for the
fuse program in round 2), so caching compiled executables across process
runs matters more here than on directly-attached devices.

The ``JAX_COMPILATION_CACHE_DIR`` environment variable is NOT honored under
the tunneled TPU plugin (the config value stays None even when the variable
is exported before import), so the cache must be enabled programmatically —
call :func:`enable_compile_cache` early, after importing jax but before the
first jit execution. bench.py, app.py and the perf scripts all do.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent). Returns the
    cache directory used."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
