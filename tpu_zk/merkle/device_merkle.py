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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import arith
from ..fields.arith import FieldCtx
from ..transcript.device_fs import (
    keccak_f1600_device,
    keccak_f1600_lanes,
    keccak_f1600_list,
)
from ..transcript.keccak import RATE

_U32 = jnp.uint32

# batch width per Pallas block: state + intermediates stay ~2 MB in VMEM
_KECCAK_BLK = 2048


def _keccak_hash_kernel(w: int, x_ref, o_ref):
    """Pallas: [w, blk] byte values -> [32, blk] digests, the whole
    permutation in VMEM.

    The XLA path pays ~20 HBM passes over the [25, 2, N] state (one per
    fused op group across 24 rounds); here the state lives in registers/VMEM
    and HBM sees only the input bytes and the 32-byte digests.  All 24
    rounds unroll in list form (``keccak_f1600_list``): pure vector ops,
    Python-static round constants, no captured index arrays."""
    blk = x_ref.shape[1]
    x = x_ref[:]
    zero = jnp.zeros((blk,), _U32)

    def byte(i):  # padded byte row i of the 136-byte block
        v = x[i] if i < w else zero
        if i == w:
            v = v ^ np.uint32(0x01)
        if i == RATE - 1:
            v = v ^ np.uint32(0x80)
        return v

    lanes = []
    for k in range(25):
        if 8 * k >= RATE:
            lanes.append((zero, zero))
            continue
        lo = byte(8 * k) | (byte(8 * k + 1) << 8) | (byte(8 * k + 2) << 16) | (byte(8 * k + 3) << 24)
        hi = byte(8 * k + 4) | (byte(8 * k + 5) << 8) | (byte(8 * k + 6) << 16) | (byte(8 * k + 7) << 24)
        lanes.append((lo, hi))
    state = keccak_f1600_list(lanes)
    rows = []
    for k in range(4):
        for half in range(2):
            v = state[k][half]
            for s in (0, 8, 16, 24):
                rows.append((v >> np.uint32(s)) & np.uint32(0xFF))
    o_ref[:] = jnp.stack(rows)


@functools.partial(jax.jit, static_argnums=(1,))
def _hash_block_T_pallas(dataT: jnp.ndarray, blk: int) -> jnp.ndarray:
    """[w, N] -> [32, N] digests via the VMEM-resident kernel; N % blk == 0."""
    w, N = dataT.shape
    return pl.pallas_call(
        functools.partial(_keccak_hash_kernel, w),
        out_shape=jax.ShapeDtypeStruct((32, N), _U32),
        grid=(N // blk,),
        in_specs=[pl.BlockSpec((w, blk), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(dataT)


def _hash_block_T(dataT: jnp.ndarray) -> jnp.ndarray:
    """Batch-transposed single-block hash: [k, N] uint32 byte values
    (k static, <= RATE-1) -> [32, N] digest bytes.

    The batch axis N stays on the TPU lane dimension end to end (pack, 24
    permutation rounds, digest extraction) -- see ``keccak_f1600_lanes``.
    On TPU, wide batches take the VMEM-resident Pallas kernel and narrow
    ones the element-major [N, 25, 2] formulation: the lane-major *XLA*
    lowering miscompiles on the axon backend below ~8 lanes (observed: a
    4-wide Merkle level hashes wrong while >= 8 is correct), so it is only
    used where it is proven -- CPU and interpret mode."""
    k, N = dataT.shape
    assert k <= RATE - 1
    if jax.default_backend() == "tpu":
        if N >= _KECCAK_BLK and N % _KECCAK_BLK == 0:
            return _hash_block_T_pallas(dataT, _KECCAK_BLK)
        return _hash_block_nm(dataT)
    buf = jnp.zeros((RATE, N), _U32).at[:k].set(dataT.astype(_U32))
    buf = buf.at[k].set(buf[k] ^ np.uint32(0x01))
    buf = buf.at[RATE - 1].set(buf[RATE - 1] ^ np.uint32(0x80))
    # pack bytes into (lo, hi) uint32 lane pairs: [17, 2, N]
    b = buf.reshape(RATE // 8, 2, 4, N)
    lanes = (b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)).astype(_U32)
    state = jnp.zeros((25, 2, N), _U32).at[: RATE // 8].set(lanes)
    state = keccak_f1600_lanes(state)
    # first 4 lanes -> 32 little-endian bytes
    sh = jnp.asarray([0, 8, 16, 24], _U32)
    out = (state[:4, :, None, :] >> sh[None, None, :, None]) & np.uint32(0xFF)  # [4, 2, 4, N]
    return out.reshape(32, N)


def _hash_block_nm(dataT: jnp.ndarray) -> jnp.ndarray:
    """Element-major fallback: [k, N] bytes -> [32, N] digests via the
    [N, 25, 2] state layout (``keccak_f1600_device``)."""
    k, N = dataT.shape
    data = dataT.T  # [N, k]
    buf = jnp.zeros((N, RATE), _U32).at[:, :k].set(data.astype(_U32))
    buf = buf.at[:, k].set(buf[:, k] ^ np.uint32(0x01))
    buf = buf.at[:, RATE - 1].set(buf[:, RATE - 1] ^ np.uint32(0x80))
    b = buf.reshape(N, RATE // 8, 2, 4)
    lanes = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)).astype(_U32)
    state = jnp.zeros((N, 25, 2), _U32).at[:, : RATE // 8].set(lanes)
    state = keccak_f1600_device(state)
    sh = jnp.asarray([0, 8, 16, 24], _U32)
    out = (state[:, :4, :, None] >> sh) & np.uint32(0xFF)  # [N, 4, 2, 4]
    return out.reshape(N, 32).T


def keccak_fixed_batch(data: jnp.ndarray) -> jnp.ndarray:
    """[N, k] uint32 byte values (k static, <= RATE-1) -> [N, 32] digests.

    Single-block absorb with 0x01/0x80 padding -- one batched permutation."""
    return _hash_block_T(data.T).T


def field_leaf_bytes(ctx: FieldCtx, table: jnp.ndarray) -> jnp.ndarray:
    """[N, L] Montgomery -> [N, nbytes] uint32 BE canonical bytes (the same
    leaf encoding as ``poly.multilinear.limbs_to_bytes_be``)."""
    plain = arith.from_mont(ctx, table)
    rev = plain[..., ::-1].astype(_U32)  # big-endian limb order
    b = jnp.stack([(rev >> 8) & np.uint32(0xFF), rev & np.uint32(0xFF)], axis=-1)
    return b.reshape(table.shape[0], ctx.nbytes)


def merkle_levels_device(leaf_bytes: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """[N, leaf_width] uint32 bytes -> tuple of digest levels
    ([N,32], [N/2,32], ..., [1,32]); levels[0] = leaf hashes.

    Internally batch-transposed ([bytes, size]) so every permutation keeps
    the size axis on TPU lanes; each level pays one small [32, size]
    transpose to expose the row-major digests the query phase gathers."""
    cur = _hash_block_T(leaf_bytes.T)  # [32, N]
    levels_T = [cur]
    while cur.shape[1] > 1:
        d3 = cur.reshape(32, cur.shape[1] // 2, 2)
        # node input = digest(2i) || digest(2i+1): [64, size/2]
        cur = _hash_block_T(jnp.concatenate([d3[:, :, 0], d3[:, :, 1]], axis=0))
        levels_T.append(cur)
    return tuple(t.T for t in levels_T)


@functools.partial(jax.jit, static_argnums=(0,))
def merkle_field_tree(ctx: FieldCtx, table: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Whole tree over field-element leaves in one device program."""
    return merkle_levels_device(field_leaf_bytes(ctx, table))
