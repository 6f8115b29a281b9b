"""Persistent XLA compilation cache.

JAX 0.9 no longer reads ``JAX_COMPILATION_CACHE_DIR`` from the environment;
the cache must be enabled via ``jax.config.update``.  Compiles dominate
wall-clock here (60-120 s per program through the remote-TPU tunnel, tens of
seconds for the big unrolled CPU graphs in tests), so every entry point
(tests, bench, graft entry) calls this first.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    # Per-backend subdirectory: a CPU process must never deserialize an
    # executable produced for the TPU backend (deserialize_executable is C++
    # and segfaults rather than raising on a mismatched/partial entry).
    backend = os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "default"
    cache_dir = os.path.join(os.path.abspath(path or _DEFAULT_DIR), backend)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
