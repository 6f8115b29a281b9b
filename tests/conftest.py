"""Test configuration: force a virtual 8-device CPU mesh before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import jax
import pytest

# sitecustomize (axon.register) overrides JAX_PLATFORMS with "axon,cpu";
# force the virtual 8-device CPU backend for tests.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
