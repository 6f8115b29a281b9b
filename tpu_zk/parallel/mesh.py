"""Device mesh + sharding helpers.

The reference is a single-threaded Rust workspace with no parallelism of any
kind (SURVEY.md section 2, "Parallelism strategies"); this module is the
communication backend the TPU-native design adds: a 1-D ``data`` mesh over
which evaluation tables and MSM point arrays shard on their element axis,
with XLA GSPMD inserting psum/all-gather collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_leading(mesh: Mesh, arr, axis_name: str = "data"):
    """Place ``arr`` with its leading axis sharded over the mesh."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
