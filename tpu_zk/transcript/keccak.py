"""Keccak-256 (the pre-NIST pad-0x01 variant used by ``sha3::Keccak256``).

Two entry points:

* :class:`Keccak256` -- incremental hasher matching the Rust ``sha3`` crate's
  ``Keccak256`` (reference ``transcripts/src/fiat_shamir/fiat_shamir_transcript.rs:5``),
  including ``.copy()`` so the transcript's clone-finalize-reabsorb pattern is
  reproducible bit-for-bit.
* :func:`keccak256_batch` -- numpy-vectorized hashing of N equal-length
  messages at once (25 uint64 lanes per state, all bitwise ops), used for
  Merkle-tree layers where millions of leaf hashes are needed.

A C++ native backend (``native/``) can replace the permutation transparently
when built; the numpy path is always available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

RATE = 136  # bytes; Keccak-256 rate (1088 bits)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_native(so: str, src: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load_native():
    """Load (building if needed) the C++ keccak kernel; None if unavailable.

    The binary name carries an ABI version so adding exports (e.g. the
    ``merkle_build`` tree builder) forces a clean rebuild instead of dlopening
    a stale library from an earlier source revision.
    """
    so = os.path.join(_NATIVE_DIR, "libkeccak_v2.so")
    src = os.path.join(_NATIVE_DIR, "keccak.cpp")
    if not os.path.exists(so):
        if not (os.path.exists(src) and _build_native(so, src)):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.keccak_absorb_blocks.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_uint64,
    ]
    lib.keccak256_many.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.merkle_build.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    return lib


_native = _load_native()

_RC = np.array(
    [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
        0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
        0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
        0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
        0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ],
    dtype=np.uint64,
)

# rotation offsets indexed [x][y] (lane l = x + 5*y)
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_U64 = np.uint64


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    s %= 64
    if s == 0:
        return x
    return (x << _U64(s)) | (x >> _U64(64 - s))


def keccak_f1600(state: np.ndarray) -> np.ndarray:
    """Keccak-f[1600] permutation on ``state[..., 25]`` uint64 lanes."""
    A = [state[..., i] for i in range(25)]

    def idx(x, y):
        return x + 5 * y

    for rnd in range(24):
        # theta
        C = [A[idx(x, 0)] ^ A[idx(x, 1)] ^ A[idx(x, 2)] ^ A[idx(x, 3)] ^ A[idx(x, 4)] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rotl(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[idx(x, y)] = A[idx(x, y)] ^ D[x]
        # rho + pi
        B = [None] * 25
        for x in range(5):
            for y in range(5):
                B[idx(y, (2 * x + 3 * y) % 5)] = _rotl(A[idx(x, y)], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                A[idx(x, y)] = B[idx(x, y)] ^ ((~B[idx((x + 1) % 5, y)]) & B[idx((x + 2) % 5, y)])
        # iota
        A[0] = A[0] ^ _RC[rnd]

    return np.stack(A, axis=-1)


def _absorb_block(state: np.ndarray, block: bytes) -> np.ndarray:
    lanes = np.frombuffer(block, dtype="<u8")
    state = state.copy()
    state[: len(lanes)] ^= lanes
    return keccak_f1600(state)


class Keccak256:
    """Incremental Keccak-256 with sha3-crate-compatible behavior."""

    def __init__(self):
        self._state = np.zeros(25, dtype=np.uint64)
        self._buf = b""

    def update(self, data: bytes) -> "Keccak256":
        self._buf += bytes(data)
        nblocks = len(self._buf) // RATE
        if nblocks:
            blocks, self._buf = self._buf[: nblocks * RATE], self._buf[nblocks * RATE :]
            if _native is not None:
                state = np.ascontiguousarray(self._state)
                _native.keccak_absorb_blocks(
                    state.ctypes.data, np.frombuffer(blocks, np.uint8).ctypes.data, nblocks
                )
                self._state = state
            else:
                for b in range(nblocks):
                    self._state = _absorb_block(self._state, blocks[b * RATE : (b + 1) * RATE])
        return self

    def copy(self) -> "Keccak256":
        c = Keccak256.__new__(Keccak256)
        c._state = self._state.copy()
        c._buf = self._buf
        return c

    # -- checkpoint/resume ----------------------------------------------------
    def snapshot(self) -> bytes:
        """Serializable sponge state (200-byte state + unabsorbed tail)."""
        return self._state.tobytes() + self._buf

    @classmethod
    def from_snapshot(cls, blob: bytes) -> "Keccak256":
        k = cls.__new__(cls)
        k._state = np.frombuffer(blob[:200], dtype=np.uint64).copy()
        k._buf = blob[200:]
        return k

    def digest(self) -> bytes:
        pad_len = RATE - len(self._buf)
        if pad_len == 1:
            padded = self._buf + b"\x81"
        else:
            padded = self._buf + b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"
        state = _absorb_block(self._state, padded)
        return state[:4].tobytes()  # 32 bytes, little-endian lanes


def keccak256(data: bytes) -> bytes:
    return Keccak256().update(data).digest()


def merkle_levels(leaves: np.ndarray) -> np.ndarray | None:
    """Build every level of a binary Merkle tree in one native call.

    leaves: [N, leaf_len] uint8, N a power of two.  Returns [2N-1, 32] uint8:
    N leaf digests, then N/2 internal nodes, ..., then the root.  None when
    the native library is unavailable (caller falls back to per-level
    :func:`keccak256_batch`).
    """
    if _native is None:
        return None
    n, leaf_len = leaves.shape
    msgs = np.ascontiguousarray(leaves.astype(np.uint8))
    out = np.empty((2 * n - 1, 32), np.uint8)
    _native.merkle_build(msgs.ctypes.data, n, leaf_len, out.ctypes.data)
    return out


def keccak256_batch(messages: np.ndarray) -> np.ndarray:
    """Hash N equal-length messages: [N, msg_len] uint8 -> [N, 32] uint8."""
    n, mlen = messages.shape
    if _native is not None and n * mlen > 1 << 8:
        msgs = np.ascontiguousarray(messages.astype(np.uint8))
        out = np.empty((n, 32), np.uint8)
        _native.keccak256_many(msgs.ctypes.data, n, mlen, out.ctypes.data)
        return out
    pad_len = RATE - (mlen % RATE)
    if pad_len == 1:
        pad = np.full((n, 1), 0x81, np.uint8)
    else:
        pad = np.zeros((n, pad_len), np.uint8)
        pad[:, 0] = 0x01
        pad[:, -1] = 0x80
    padded = np.concatenate([messages.astype(np.uint8), pad], axis=1)
    nblocks = padded.shape[1] // RATE
    state = np.zeros((n, 25), dtype=np.uint64)
    for b in range(nblocks):
        block = padded[:, b * RATE : (b + 1) * RATE]
        lanes = block.reshape(n, RATE // 8, 8).copy().view("<u8").reshape(n, RATE // 8)
        state[:, : RATE // 8] ^= lanes
        state = keccak_f1600(state)
    return state[:, :4].copy().view(np.uint8).reshape(n, 32)
