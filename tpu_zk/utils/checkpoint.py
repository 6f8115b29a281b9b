"""Mid-proof checkpoint / resume for long-running provers.

The reference builds proofs in one call with no persistence (SURVEY.md
section 5, "Checkpoint / resume: none").  At 2^24-scale a prover run is long
enough that elastic restart matters: this module snapshots the full sumcheck
prover state -- round index, the folded device table, the accumulated round
univariates, and the Fiat-Shamir sponge state -- so a proof can resume on a
fresh process (or different host count; the table layout is logical, not
shard-physical) and produce bit-identical output.
"""

from __future__ import annotations

import io
import pickle

import jax
import numpy as np

from ..fields.arith import FieldCtx, field_ctx
from ..poly.multilinear import MultilinearPolynomial, fold, sum_halves
from ..sumcheck.basic import SumcheckProof
from ..transcript.fiat_shamir import Transcript


class CheckpointableSumcheckProver:
    """Basic-sumcheck prover that can pause/resume between rounds.

    Produces transcripts bit-identical to ``sumcheck.basic.Prover``.
    """

    def __init__(self, polynomial: MultilinearPolynomial):
        self.ctx = polynomial.ctx
        self.initial_polynomial = polynomial
        self.initial_claimed_sum = polynomial.sum()
        self.transcript = Transcript()
        self.transcript.append(polynomial.convert_to_bytes())
        self.transcript.append(self.ctx.to_bytes_be(self.initial_claimed_sum))
        self.current = polynomial.table
        self.round = 0
        self.round_polys: list[MultilinearPolynomial] = []

    @property
    def total_rounds(self) -> int:
        return self.initial_polynomial.number_of_variables

    def step(self) -> None:
        """Run one sumcheck round."""
        assert self.round < self.total_rounds
        ctx = self.ctx
        univariate = MultilinearPolynomial(ctx, sum_halves(ctx, self.current))
        self.round_polys.append(univariate)
        self.transcript.append(univariate.convert_to_bytes())
        challenge = self.transcript.random_challenge_as_field_element(ctx)
        self.current = fold(ctx, self.current, 0, ctx.scalar(challenge))
        self.round += 1

    def run(self, max_rounds: int | None = None) -> SumcheckProof | None:
        """Run up to ``max_rounds`` rounds; returns the proof when complete."""
        budget = max_rounds if max_rounds is not None else self.total_rounds
        while self.round < self.total_rounds and budget > 0:
            self.step()
            budget -= 1
        if self.round == self.total_rounds:
            return SumcheckProof(
                initial_polynomial=self.initial_polynomial,
                initial_claimed_sum=self.initial_claimed_sum,
                round_univariate_polynomials=self.round_polys,
            )
        return None

    # -- persistence ---------------------------------------------------------
    def save(self) -> bytes:
        state = {
            "field": self.ctx.name,
            "round": self.round,
            "initial_claimed_sum": self.initial_claimed_sum,
            "initial_table": np.asarray(jax.device_get(self.initial_polynomial.table)),
            "current_table": np.asarray(jax.device_get(self.current)),
            "round_polys": [np.asarray(jax.device_get(u.table)) for u in self.round_polys],
            "transcript": self.transcript.snapshot(),
        }
        buf = io.BytesIO()
        pickle.dump(state, buf)
        return buf.getvalue()

    @classmethod
    def load(cls, blob: bytes) -> "CheckpointableSumcheckProver":
        state = pickle.load(io.BytesIO(blob))
        ctx = field_ctx(state["field"])
        self = cls.__new__(cls)
        self.ctx = ctx
        self.initial_polynomial = MultilinearPolynomial(
            ctx, jax.numpy.asarray(state["initial_table"])
        )
        self.initial_claimed_sum = state["initial_claimed_sum"]
        self.transcript = Transcript.from_snapshot(state["transcript"])
        self.current = jax.numpy.asarray(state["current_table"])
        self.round = state["round"]
        self.round_polys = [
            MultilinearPolynomial(ctx, jax.numpy.asarray(t)) for t in state["round_polys"]
        ]
        return self
