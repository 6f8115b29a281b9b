"""Persistent XLA compilation cache.

JAX 0.9 no longer reads ``JAX_COMPILATION_CACHE_DIR`` from the environment;
the cache must be enabled via ``jax.config.update``.  Compiles dominate
wall-clock here (60-120 s per program through the remote-TPU tunnel, tens of
seconds for the big unrolled CPU graphs in tests), so every entry point
(tests, bench, graft entry) calls this first.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _host_fingerprint() -> str:
    """Hash of the host CPU's ISA feature flags.

    XLA:CPU AOT executables encode the compile machine's vector ISA; loading
    one on a host with a different feature set (sessions run on varying
    machines) aborts with SIGILL/segfault instead of a cache miss.  Keying the
    cache directory by the flag set makes such entries invisible rather than
    fatal.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nocpuinfo"


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
    cache_dir = os.path.join(
        os.path.abspath(path or _DEFAULT_DIR), backend + "-" + _host_fingerprint()
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
