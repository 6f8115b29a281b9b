"""Keccak-256 Merkle tree over field-element leaves.

The reference declares a ``merkle_tree`` crate but left it empty
(``merkle_tree/src/lib.rs`` is 0 lines); this fills the slot.  Leaf and node
hashing run through the numpy-vectorized Keccak batch kernel
(:func:`tpu_zk.transcript.keccak.keccak256_batch`), so a 2^18-leaf commit is
a handful of vectorized passes rather than 2^19 interpreter-loop hashes.
"""

from __future__ import annotations

import numpy as np

from ..transcript.keccak import keccak256_batch, merkle_levels


class MerkleTree:
    """levels[0] = leaf hashes ... levels[-1] = [root]."""

    def __init__(self, leaves: np.ndarray):
        """leaves: [N, leaf_bytes] uint8, N a power of two."""
        n = leaves.shape[0]
        assert n > 0 and (n & (n - 1)) == 0, "leaf count must be a power of 2"
        flat = merkle_levels(leaves)
        if flat is not None:
            # one native threaded call builds every level back to back
            levels, off, width = [], 0, n
            while width >= 1:
                levels.append(flat[off : off + width])
                off += width
                width //= 2
            self.levels = levels
            return
        levels = [keccak256_batch(leaves)]
        while levels[-1].shape[0] > 1:
            cur = levels[-1]
            paired = cur.reshape(cur.shape[0] // 2, 64)
            levels.append(keccak256_batch(paired))
        self.levels = levels

    @property
    def root(self) -> bytes:
        return self.levels[-1][0].tobytes()

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[0]

    def open(self, index: int) -> list[bytes]:
        """Authentication path: sibling hash per level, leaf level first."""
        path = []
        for level in self.levels[:-1]:
            sibling = index ^ 1
            path.append(level[sibling].tobytes())
            index >>= 1
        return path


def verify_path(root: bytes, leaf: bytes, index: int, path: list[bytes]) -> bool:
    current = keccak256_batch(np.frombuffer(leaf, np.uint8)[None, :])[0].tobytes()
    for sibling in path:
        pair = current + sibling if index % 2 == 0 else sibling + current
        current = keccak256_batch(np.frombuffer(pair, np.uint8)[None, :])[0].tobytes()
        index >>= 1
    return current == root
