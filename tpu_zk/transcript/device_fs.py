"""Device-resident Fiat-Shamir: Keccak-256 sponge as traced JAX ops.

Why this exists
---------------
The protocol requires one transcript absorb/squeeze per sumcheck round
(reference ``basic_sumcheck/prover.rs:35-71``).  With a host-side hasher that
is one host<->device round trip per round; through the remote-TPU tunnel a
round trip costs ~35 ms, which dwarfs the actual kernel time (a 2^20-table
round is <5 ms of compute).  Running the sponge *on device* lets an entire
prove -- all rounds, folds, half-sums, challenges -- compile into ONE program
with a single dispatch.

Bit-exactness
-------------
The sponge replicates the Rust ``sha3::Keccak256`` semantics used by the
reference transcript (``transcripts/src/fiat_shamir/fiat_shamir_transcript.rs``):
incremental absorb with a 136-byte rate buffer, clone-finalize (pad 0x01 /
0x80, or 0x81 when one pad byte) to squeeze, then re-absorb the 32-byte
digest into the live sponge.  Challenges reduce the digest little-endian mod
p (``from_le_bytes_mod_order``).  ``tests/test_transcript.py`` cross-checks
every byte against the host `Transcript`.

Representation
--------------
TPUs have no native 64-bit integers, so each of the 25 Keccak lanes is an
(lo, hi) pair of uint32: state is a ``[25, 2]`` array.  All permutation steps
are whole-state vector ops (per-lane rotation amounts are constant arrays, so
rho is two vector shifts); the 24 rounds run under ``lax.fori_loop``.  The
rate buffer is a ``[RATE]`` uint32 byte array whose fill level is *static*
(absorb sizes are known at trace time), so block boundaries resolve at trace
time and each absorb lowers to pure XOR + permutation calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.arith import FieldCtx, _limbs_of_int
from .keccak import RATE, _RC, _ROT

_U32 = jnp.uint32

# round constants as (lo, hi) uint32 pairs: [24, 2]
_RC_PAIRS = np.stack(
    [(_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32), (_RC >> np.uint64(32)).astype(np.uint32)],
    axis=-1,
)

# rho+pi tables: out lane j takes src lane _PI_SRC[j] rotated by _PI_ROT[j]
_PI_SRC = np.zeros(25, np.int32)
_PI_ROT = np.zeros(25, np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
        _PI_ROT[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _ROT[_x][_y]

# chi neighbor tables: lane (x, y) pairs with ((x+1)%5, y), ((x+2)%5, y)
_CHI_1 = np.array([((x + 1) % 5) + 5 * y for y in range(5) for x in range(5)], np.int32)
_CHI_2 = np.array([((x + 2) % 5) + 5 * y for y in range(5) for x in range(5)], np.int32)


def _rotl_pair(lo: jnp.ndarray, hi: jnp.ndarray, s):
    """Rotate-left (lo, hi) 64-bit pairs by per-lane amounts ``s`` (0..63)."""
    s = jnp.asarray(s, _U32)
    swap = s >= 32
    lo1 = jnp.where(swap, hi, lo)
    hi1 = jnp.where(swap, lo, hi)
    sm = s % 32
    inv = (32 - sm) % 32
    nlo = jnp.where(sm == 0, lo1, (lo1 << sm) | (hi1 >> inv))
    nhi = jnp.where(sm == 0, hi1, (hi1 << sm) | (lo1 >> inv))
    return nlo, nhi


def keccak_f1600_device(state: jnp.ndarray) -> jnp.ndarray:
    """Keccak-f[1600] on a ``[..., 25, 2]`` uint32 (lo, hi) lane array."""
    rc = jnp.asarray(_RC_PAIRS)
    pi_src = jnp.asarray(_PI_SRC)
    pi_rot = jnp.asarray(_PI_ROT)
    chi1 = jnp.asarray(_CHI_1)
    chi2 = jnp.asarray(_CHI_2)

    def rnd(i, A):
        # theta
        grid = A.reshape(A.shape[:-2] + (5, 5, 2))  # [..., y, x, 2]
        C = grid[..., 0, :, :] ^ grid[..., 1, :, :] ^ grid[..., 2, :, :] ^ grid[..., 3, :, :] ^ grid[..., 4, :, :]
        c_lo, c_hi = C[..., 0], C[..., 1]  # [..., 5]
        r_lo, r_hi = _rotl_pair(jnp.roll(c_lo, -1, -1), jnp.roll(c_hi, -1, -1), 1)
        d_lo = jnp.roll(c_lo, 1, -1) ^ r_lo
        d_hi = jnp.roll(c_hi, 1, -1) ^ r_hi
        D = jnp.stack([d_lo, d_hi], -1)  # [..., 5(x), 2]
        A = (grid ^ D[..., None, :, :]).reshape(A.shape)
        # rho + pi
        src = jnp.take(A, pi_src, axis=-2)
        b_lo, b_hi = _rotl_pair(src[..., 0], src[..., 1], pi_rot)
        B = jnp.stack([b_lo, b_hi], -1)
        # chi
        A = B ^ (~jnp.take(B, chi1, axis=-2) & jnp.take(B, chi2, axis=-2))
        # iota
        return A.at[..., 0, :].set(A[..., 0, :] ^ rc[i])

    return jax.lax.fori_loop(0, 24, rnd, state)


def keccak_round_lanes(A: jnp.ndarray, rc_pair: jnp.ndarray) -> jnp.ndarray:
    """One Keccak-f round on a ``[25, 2, N]`` lane array (rc_pair: [2])."""

    def rot1(c):  # [..., 2, N] 64-bit rotate-left by 1
        lo, hi = c[..., 0, :], c[..., 1, :]
        return jnp.stack([(lo << 1) | (hi >> 31), (hi << 1) | (lo >> 31)], axis=-2)

    def rot_static(lo, hi, s):  # rotate-left by Python-int s
        if s >= 32:
            lo, hi = hi, lo
            s -= 32
        if s == 0:
            return lo, hi
        return (lo << s) | (hi >> (32 - s)), (hi << s) | (lo >> (32 - s))

    # theta: C[x] = xor_y A[x + 5y]
    grid = A.reshape((5, 5) + A.shape[1:])  # [y, x, 2, N]
    C = grid[0] ^ grid[1] ^ grid[2] ^ grid[3] ^ grid[4]  # [5, 2, N]
    D = jnp.roll(C, 1, axis=0) ^ rot1(jnp.roll(C, -1, axis=0))
    A = (grid ^ D[None]).reshape(A.shape)
    # rho + pi (static per-lane rotations, unrolled)
    B = [None] * 25
    for j in range(25):
        src = A[_PI_SRC[j]]  # [2, N]
        lo, hi = rot_static(src[0], src[1], int(_PI_ROT[j]))
        B[j] = jnp.stack([lo, hi])
    B = jnp.stack(B)  # [25, 2, N]
    # chi
    A = B ^ (~B[_CHI_1] & B[_CHI_2])
    # iota
    return A.at[0].set(A[0] ^ rc_pair[:, None])


def keccak_f1600_list(lanes: list) -> list:
    """Keccak-f[1600] on a list of 25 (lo, hi) uint32-array pairs.

    Fully static formulation -- every roll/gather of the array version
    becomes Python list indexing, so it lowers to plain vector xor/shift/and
    with NO constant index arrays.  This is the form Pallas kernels need
    (pallas_call rejects captured constants) and it compiles to the same
    speed-of-light code path.  24 rounds, Python-unrolled, static round
    constants."""

    def rot(pair, s):
        lo, hi = pair
        if s >= 32:
            lo, hi = hi, lo
            s -= 32
        if s == 0:
            return (lo, hi)
        return ((lo << s) | (hi >> (32 - s)), (hi << s) | (lo >> (32 - s)))

    def x2(a, b):
        return (a[0] ^ b[0], a[1] ^ b[1])

    A = list(lanes)
    for i in range(24):
        # theta
        C = [
            x2(x2(x2(x2(A[x], A[x + 5]), A[x + 10]), A[x + 15]), A[x + 20])
            for x in range(5)
        ]
        D = [x2(C[(x - 1) % 5], rot(C[(x + 1) % 5], 1)) for x in range(5)]
        A = [x2(A[j], D[j % 5]) for j in range(25)]
        # rho + pi
        B = [rot(A[int(_PI_SRC[j])], int(_PI_ROT[j])) for j in range(25)]
        # chi
        A = [
            (
                B[j][0] ^ (~B[int(_CHI_1[j])][0] & B[int(_CHI_2[j])][0]),
                B[j][1] ^ (~B[int(_CHI_1[j])][1] & B[int(_CHI_2[j])][1]),
            )
            for j in range(25)
        ]
        # iota
        A[0] = (A[0][0] ^ np.uint32(_RC_PAIRS[i, 0]), A[0][1] ^ np.uint32(_RC_PAIRS[i, 1]))
    return A


def keccak_f1600_lanes(state: jnp.ndarray) -> jnp.ndarray:
    """Keccak-f[1600] on a ``[25, 2, N]`` uint32 (lo, hi) lane array.

    Batch-transposed layout for the *vectorized* users (Merkle levels, FRI
    commits): the batch axis N rides the 128-wide TPU lane dimension, where
    the ``[N, 25, 2]`` layout of :func:`keccak_f1600_device` puts a size-2
    axis there (2/128 lanes live).  Rho/pi rotation amounts are Python-static
    (unrolled over the 25 lanes), so every step is a full-width shift/
    xor/and -- no per-lane selects or gathers.  Bit-identical to the
    reference permutation.
    """
    rc = jnp.asarray(_RC_PAIRS)
    return jax.lax.fori_loop(0, 24, lambda i, A: keccak_round_lanes(A, rc[i]), state)


def _pack_lanes(block: jnp.ndarray) -> jnp.ndarray:
    """[k*8] uint32 bytes -> [k, 2] uint32 lanes, little-endian within lanes."""
    k8 = block.shape[0]
    b = block.reshape(k8 // 8, 2, 4).astype(_U32)
    return (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)).astype(_U32)


def _lanes_to_bytes(lanes: jnp.ndarray) -> jnp.ndarray:
    """[k, 2] uint32 lanes -> [k*8] uint32 byte values (little-endian)."""
    sh = jnp.asarray([0, 8, 16, 24], _U32)
    b = (lanes[..., None] >> sh) & np.uint32(0xFF)  # [k, 2, 4]
    return b.reshape(-1)


class DeviceSponge:
    """Functional Keccak-256 sponge whose buffer fill level is trace-static.

    Immutable-style: every operation returns a new ``DeviceSponge``.  ``state``
    is a traced ``[25, 2]`` uint32 array; ``buf`` a traced ``[RATE]`` uint32
    byte array (only the first ``pos`` entries meaningful); ``pos`` a Python
    int fixed at trace time.
    """

    __slots__ = ("state", "buf", "pos")

    def __init__(self, state: jnp.ndarray, buf: jnp.ndarray, pos: int):
        self.state = state
        self.buf = buf
        self.pos = pos

    @classmethod
    def fresh(cls) -> "DeviceSponge":
        return cls(jnp.zeros((25, 2), _U32), jnp.zeros((RATE,), _U32), 0)

    @classmethod
    def from_host(cls, host_hasher) -> "DeviceSponge":
        """Seed from a host ``Keccak256`` (e.g. after absorbing the initial
        polynomial host-side, which is cheaper through native keccak)."""
        st = np.asarray(host_hasher._state, np.uint64)
        pairs = np.stack([(st & np.uint64(0xFFFFFFFF)).astype(np.uint32), (st >> np.uint64(32)).astype(np.uint32)], -1)
        tail = np.frombuffer(host_hasher._buf, np.uint8)
        buf = np.zeros(RATE, np.uint32)
        buf[: len(tail)] = tail
        return cls(jnp.asarray(pairs), jnp.asarray(buf), len(tail))

    def to_host(self, state_np: np.ndarray, buf_np: np.ndarray):
        """Materialized (state, buf) arrays -> host ``Keccak256`` (for
        continuing the transcript host-side after a fused program)."""
        from .keccak import Keccak256

        k = Keccak256()
        lo = state_np[:, 0].astype(np.uint64)
        hi = state_np[:, 1].astype(np.uint64)
        k._state = lo | (hi << np.uint64(32))
        k._buf = bytes(buf_np[: self.pos].astype(np.uint8).tobytes())
        return k

    # -- core ops -------------------------------------------------------------
    def absorb(self, data: jnp.ndarray) -> "DeviceSponge":
        """Absorb ``data`` ([k] uint32 byte values, k static)."""
        k = data.shape[0]
        stream = jnp.concatenate([self.buf[: self.pos], data.astype(_U32)])
        total = self.pos + k
        nblocks = total // RATE
        state = self.state
        for b in range(nblocks):
            lanes = _pack_lanes(stream[b * RATE : (b + 1) * RATE])
            state = state.at[: RATE // 8].set(state[: RATE // 8] ^ lanes)
            state = keccak_f1600_device(state)
        rem = total - nblocks * RATE
        buf = jnp.zeros((RATE,), _U32)
        if rem:
            buf = buf.at[:rem].set(stream[nblocks * RATE :])
        return DeviceSponge(state, buf, rem)

    def squeeze(self) -> tuple[jnp.ndarray, "DeviceSponge"]:
        """Clone-finalize-reabsorb (reference ``sample_random_challenge``):
        returns ([32] uint32 digest bytes, updated sponge)."""
        pos = self.pos
        pad = np.zeros(RATE - pos, np.uint32)
        if RATE - pos == 1:
            pad[0] = 0x81
        else:
            pad[0] = 0x01
            pad[-1] = 0x80
        padded = jnp.concatenate([self.buf[:pos], jnp.asarray(pad)])
        lanes = _pack_lanes(padded)
        clone = self.state.at[: RATE // 8].set(self.state[: RATE // 8] ^ lanes)
        clone = keccak_f1600_device(clone)
        digest = _lanes_to_bytes(clone[:4])  # [32] bytes
        return digest, self.absorb(digest)

    def challenge_mont(self, ctx: FieldCtx) -> tuple[jnp.ndarray, "DeviceSponge"]:
        """Squeeze a field challenge: digest LE mod p, in Montgomery form [L]."""
        digest, sponge = self.squeeze()
        r = digest_to_mont(ctx, digest)
        return r, sponge


# ---------------------------------------------------------------------------
# dynamic-position sponge ops
# ---------------------------------------------------------------------------
#
# ``DeviceSponge`` requires the buffer fill level to be a Python int fixed at
# trace time, which forces one compiled program per (shape, pos) pair.  The
# fused sparse-GKR prover reuses ONE compiled round program per table size
# across all layers/phases, where ``pos`` differs call to call -- so these
# variants carry ``pos`` as a *traced* int32 scalar.  Invariant: ``buf`` is a
# [RATE] uint32 byte array with ``buf[pos:] == 0``.


def absorb_dyn(state: jnp.ndarray, buf: jnp.ndarray, pos: jnp.ndarray, data: jnp.ndarray):
    """Absorb ``data`` ([k] uint32 bytes, k static and <= RATE) at traced pos.

    Returns (state, buf, pos).  Since pos < RATE and k <= RATE, at most one
    block boundary is crossed, resolved with a single ``lax.cond``.
    """
    k = data.shape[0]
    assert k <= RATE
    combined = jnp.zeros((2 * RATE,), _U32).at[:RATE].set(buf)
    combined = jax.lax.dynamic_update_slice(combined, data.astype(_U32), (pos,))
    total = pos + k

    def with_perm(args):
        st, comb = args
        lanes = _pack_lanes(comb[:RATE])
        st = st.at[: RATE // 8].set(st[: RATE // 8] ^ lanes)
        return keccak_f1600_device(st), comb[RATE:]

    def no_perm(args):
        st, comb = args
        return st, comb[:RATE]

    state, buf = jax.lax.cond(total >= RATE, with_perm, no_perm, (state, combined))
    pos = total - jnp.where(total >= RATE, RATE, 0)
    return state, buf, pos


def squeeze_dyn(state: jnp.ndarray, buf: jnp.ndarray, pos: jnp.ndarray):
    """Clone-finalize-reabsorb at traced pos: returns ([32] digest bytes,
    state, buf, pos) -- same semantics as ``DeviceSponge.squeeze``."""
    iota = jnp.arange(RATE, dtype=jnp.int32)
    pad = jnp.where(iota == pos, np.uint32(0x01), np.uint32(0)).astype(_U32)
    pad = pad.at[RATE - 1].set(pad[RATE - 1] | np.uint32(0x80))
    padded = buf ^ pad
    lanes = _pack_lanes(padded)
    clone = state.at[: RATE // 8].set(state[: RATE // 8] ^ lanes)
    clone = keccak_f1600_device(clone)
    digest = _lanes_to_bytes(clone[:4])
    state, buf, pos = absorb_dyn(state, buf, pos, digest)
    return digest, state, buf, pos


def digest_to_mont(ctx: FieldCtx, digest: jnp.ndarray) -> jnp.ndarray:
    """[32] uint32 LE digest bytes -> Montgomery [L] limbs of digest mod p.

    The raw digest (< 2^256 = B^L for our 256-bit-limb fields) feeds CIOS
    directly: mont_mul(x, R^2) = (x mod p) * R, valid for any x < B^L.
    """
    from ..fields import arith

    assert ctx.L * 16 == 256, "challenge reduction assumes 32-byte digests"
    b = digest.reshape(ctx.L, 2)
    limbs = (b[:, 0] | (b[:, 1] << 8)).astype(_U32)
    r2 = jnp.asarray(_limbs_of_int(ctx.R2, ctx.L))
    return arith.mont_mul(ctx, limbs, r2)


def pack_bytes_be(ctx: FieldCtx, plain: jnp.ndarray) -> jnp.ndarray:
    """[..., L] strict plain limbs -> [... * nbytes] uint32 BE byte stream
    (arkworks ``to_bytes_be`` / ``convert_to_bytes`` parity)."""
    assert ctx.L * 2 == ctx.nbytes
    rev = plain[..., ::-1].astype(_U32)
    b = jnp.stack([(rev >> 8) & np.uint32(0xFF), rev & np.uint32(0xFF)], axis=-1)
    return b.reshape(-1)


def pack_bytes_le(ctx: FieldCtx, plain: jnp.ndarray) -> jnp.ndarray:
    """[..., L] strict plain limbs -> [... * nbytes] uint32 LE byte stream
    (reference GKR-sumcheck absorbs LE bytes, ``sumcheck_gkr_protocol.rs:145-150``)."""
    assert ctx.L * 2 == ctx.nbytes
    b = jnp.stack([plain & np.uint32(0xFF), (plain >> 8) & np.uint32(0xFF)], axis=-1)
    return b.reshape(-1)
