"""Test configuration: force a virtual 8-device CPU mesh before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen segfaults sporadically in long-lived
    # processes that compile hundreds of programs (observed repeatedly in
    # this suite around the MSM graphs); single-threaded codegen is stable.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import random

import jax
import pytest

# sitecustomize (axon.register) overrides JAX_PLATFORMS with "axon,cpu";
# force the virtual 8-device CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

from tpu_zk.utils.cache import enable_persistent_cache

enable_persistent_cache()


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
