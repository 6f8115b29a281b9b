"""Multi-device Merkle tree: leaf hashing sharded, subtree roots gathered.

SURVEY.md section 2 parallelism table, row "Merkle/FRI": *leaf hashing
sharded; all_gather of per-shard subtree roots; top of tree on one device*.
Each device hashes its contiguous block of leaves and builds its whole
subtree locally (batched single-block Keccak, ``merkle/device_merkle.py``)
under ``shard_map``; because a contiguous block of ``N/D`` leaves is exactly
one aligned subtree, the stacked per-shard levels ARE the global tree's
bottom levels, and the ``log2(D)`` top levels complete from the D gathered
subtree roots.  Digests are bit-identical to the single-device tree
(``tests/test_parallel.py``).

This is also FRI's distributed commit shape: each round = sharded fold
(``sharded_sumcheck``'s layout) + this tree + root absorb.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fields.arith import FieldCtx
from ..merkle.device_merkle import (
    field_leaf_bytes,
    keccak_fixed_batch,
    merkle_field_tree,
    merkle_levels_device,
)


def sharded_merkle_field_tree(ctx: FieldCtx, table: jnp.ndarray, mesh):
    """[N, L] Montgomery field leaves -> tuple of digest levels
    ([N,32], ..., [1,32]), leaf hashing and subtrees sharded over the mesh."""
    D = int(mesh.devices.size)
    N = int(table.shape[0])
    if D <= 1 or N % D or (N // D) & (N // D - 1):
        return merkle_field_tree(ctx, table)  # unshardable: single device

    local = jax.shard_map(
        lambda t: merkle_levels_device(field_leaf_bytes(ctx, t)),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
        check_vma=False,
    )
    bottom = local(table)  # ([N,32], [N/2,32], ..., [D,32])
    levels = list(bottom)
    while levels[-1].shape[0] > 1:  # top log2(D) levels from subtree roots
        cur = levels[-1]
        levels.append(keccak_fixed_batch(cur.reshape(cur.shape[0] // 2, 64)))
    return tuple(levels)
