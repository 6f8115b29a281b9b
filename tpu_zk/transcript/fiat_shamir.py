"""Fiat-Shamir transcript, bit-identical to the reference.

Reference semantics (``transcripts/src/fiat_shamir/fiat_shamir_transcript.rs``):

* ``append`` incrementally updates a Keccak256 state (:22-24).
* ``sample_random_challenge`` clones the hasher, finalizes the clone to get a
  32-byte digest, then absorbs that digest back into the live hasher (:29-36).
* ``random_challenge_as_field_element`` reduces the 32 bytes **little-endian**
  mod the field order (:38-43, ``from_le_bytes_mod_order``).

The transcript is inherently sequential host-side work; one challenge per
sumcheck round is the protocol's host sync point (SURVEY.md section 3.1).
"""

from __future__ import annotations

from ..fields.arith import FieldCtx
from .keccak import Keccak256


class Transcript:
    def __init__(self):
        self._hasher = Keccak256()

    def append(self, data: bytes) -> None:
        self._hasher.update(data)

    def sample_random_challenge(self) -> bytes:
        digest = self._hasher.copy().digest()
        self._hasher.update(digest)
        return digest

    def random_challenge_as_field_element(self, ctx: FieldCtx) -> int:
        """Returns the challenge as a canonical python int in [0, p)."""
        return ctx.from_le_bytes_mod_order(self.sample_random_challenge())

    # -- checkpoint/resume ----------------------------------------------------
    def snapshot(self) -> bytes:
        return self._hasher.snapshot()

    @classmethod
    def from_snapshot(cls, blob: bytes) -> "Transcript":
        t = cls.__new__(cls)
        t._hasher = Keccak256.from_snapshot(blob)
        return t
