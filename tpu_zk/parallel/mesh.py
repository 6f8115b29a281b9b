"""Device mesh + sharding helpers.

The reference is a single-threaded Rust workspace with no parallelism of any
kind (SURVEY.md section 2, "Parallelism strategies"); this module is the
communication backend the TPU-native design adds: a 1-D ``data`` mesh over
which evaluation tables and MSM point arrays shard on their element axis,
with XLA GSPMD inserting psum/all-gather collectives over ICI.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-host (DCN) runtime if configured; else no-op.

    On a multi-host TPU slice every host runs the same program;
    ``jax.distributed.initialize`` wires the hosts so ``jax.devices()``
    spans the whole slice and GSPMD collectives ride ICI within the slice
    and DCN across slices.  Configuration comes from the arguments or the
    standard env vars (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); with none present (single-host dev, CI, the
    virtual CPU mesh) this is a no-op returning False.

    Fiat-Shamir determinism replaces challenge broadcast: every host
    derives identical challenges from identical absorbed bytes, so no
    explicit cross-host communication exists outside XLA collectives
    (SURVEY.md section 5, "Distributed communication backend").
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    # Leave unset values as None so jax.distributed.initialize runs its own
    # cluster auto-detection (e.g. Cloud TPU metadata) instead of silently
    # forming a one-process "cluster" from a partially configured env.
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over up to ``n_devices`` devices (all hosts' devices after
    :func:`init_distributed` on a multi-host slice)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_leading(mesh: Mesh, arr, axis_name: str = "data"):
    """Place ``arr`` with its leading axis sharded over the mesh."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
