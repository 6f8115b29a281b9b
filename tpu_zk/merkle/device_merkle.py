"""Device-resident Keccak-256 Merkle tree (batched single-block hashing).

FRI's prove loop was host-transfer-bound: every round pulled the whole
codeword to the host (`from_mont` -> BE bytes -> native Merkle), ~2x the
codeword in bytes per round through a ~25 ms-latency tunnel.  Leaves here are
32-byte field encodings and nodes 64-byte digest pairs -- both under the
136-byte Keccak rate, so every hash is exactly ONE keccak-f permutation and a
whole level vectorizes as a single batched permutation call on device.  Only
the 32-byte root (and, at query time, the opened siblings) ever leave the
chip.

Digests are bit-identical to the host tree (``merkle.merkle.MerkleTree``):
same leaf encoding, same pair concatenation, same Keccak-256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..transcript.device_fs import keccak_f1600_device
from ..transcript.keccak import RATE

_U32 = jnp.uint32


def keccak_fixed_batch(data: jnp.ndarray) -> jnp.ndarray:
    """[N, k] uint32 byte values (k static, <= RATE-1) -> [N, 32] digests.

    Single-block absorb with 0x01/0x80 padding -- one batched permutation."""
    N, k = data.shape
    assert k <= RATE - 1
    buf = jnp.zeros((N, RATE), _U32).at[:, :k].set(data.astype(_U32))
    buf = buf.at[:, k].set(buf[:, k] ^ np.uint32(0x01))
    buf = buf.at[:, RATE - 1].set(buf[:, RATE - 1] ^ np.uint32(0x80))
    # pack bytes into (lo, hi) uint32 lane pairs: [N, 17, 2]
    b = buf.reshape(N, RATE // 8, 2, 4)
    lanes = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)).astype(_U32)
    state = jnp.zeros((N, 25, 2), _U32).at[:, : RATE // 8].set(lanes)
    state = keccak_f1600_device(state)
    # first 4 lanes -> 32 little-endian bytes
    sh = jnp.asarray([0, 8, 16, 24], _U32)
    out = (state[:, :4, :, None] >> sh) & np.uint32(0xFF)  # [N, 4, 2, 4]
    return out.reshape(N, 32)


def field_leaf_bytes(ctx: FieldCtx, table: jnp.ndarray) -> jnp.ndarray:
    """[N, L] Montgomery -> [N, nbytes] uint32 BE canonical bytes (the same
    leaf encoding as ``poly.multilinear.limbs_to_bytes_be``)."""
    plain = arith.from_mont(ctx, table)
    rev = plain[..., ::-1].astype(_U32)  # big-endian limb order
    b = jnp.stack([(rev >> 8) & np.uint32(0xFF), rev & np.uint32(0xFF)], axis=-1)
    return b.reshape(table.shape[0], ctx.nbytes)


def merkle_levels_device(leaf_bytes: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """[N, leaf_width] uint32 bytes -> tuple of digest levels
    ([N,32], [N/2,32], ..., [1,32]); levels[0] = leaf hashes."""
    levels = [keccak_fixed_batch(leaf_bytes)]
    while levels[-1].shape[0] > 1:
        cur = levels[-1]
        levels.append(keccak_fixed_batch(cur.reshape(cur.shape[0] // 2, 64)))
    return tuple(levels)


@functools.partial(jax.jit, static_argnums=(0,))
def merkle_field_tree(ctx: FieldCtx, table: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Whole tree over field-element leaves in one device program."""
    return merkle_levels_device(field_leaf_bytes(ctx, table))
