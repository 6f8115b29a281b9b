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

    # The cache only pays for itself on the remote-TPU tunnel (60-120 s per
    # compile).  XLA:CPU AOT (de)serialization is unreliable across the
    # heterogeneous hosts these sessions land on -- both loading an entry
    # compiled for a different vector ISA and *serializing* some multi-device
    # CPU executables segfault in C++ rather than raising -- so the CPU
    # backend runs without a persistent cache.
    backend = os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "default"
    if backend == "cpu" or jax.default_backend() == "cpu":
        jax.config.update("jax_enable_compilation_cache", False)
        return
    # TPU/axon executables target the accelerator, not the host CPU, so the
    # host-ISA fingerprint (an XLA:CPU AOT safety key) must NOT key the cache:
    # sessions hop between hosts and a fingerprinted dir would cold-miss the
    # whole 2+ GB cache on every hop.
    cache_dir = os.path.join(os.path.abspath(path or _DEFAULT_DIR), backend)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
