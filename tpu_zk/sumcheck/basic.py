"""Basic non-interactive sumcheck over a multilinear evaluation table.

Host-device split: the 2^n limb table lives on device; each round runs one
fused half-sum kernel (round univariate) and one fold kernel, with a single
host sync to absorb bytes / squeeze the Fiat-Shamir challenge -- the minimal
sync pattern the protocol permits.

Reference parity: ``sumcheck_protocol/src/basic_sumcheck/prover.rs``
(init :22-33, prove :35-71, split_polynomial_and_sum_each :74-89) and
``verifier.rs`` (verify :23-71).  Transcript absorb order: full initial
polynomial bytes (BE), claimed sum (BE), then per round the 2-point
univariate (BE) before squeezing the challenge.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.multilinear import (
    MultilinearPolynomial,
    fold,
    fused_round,
    limbs_to_bytes_be,
    round0_univariate,
    sum_halves,
)
from ..transcript.fiat_shamir import Transcript


@dataclass
class SumcheckProof:
    initial_polynomial: MultilinearPolynomial
    initial_claimed_sum: int
    round_univariate_polynomials: list[MultilinearPolynomial]  # 2-entry eval form


class Prover:
    def __init__(self, polynomial: MultilinearPolynomial):
        self.ctx = polynomial.ctx
        self.initial_polynomial = polynomial
        self.initial_claimed_sum = polynomial.sum()
        self.transcript = Transcript()

    @classmethod
    def init(cls, ctx: FieldCtx, values) -> "Prover":
        return cls(MultilinearPolynomial.from_ints(ctx, values))

    def prove(self) -> SumcheckProof:
        ctx = self.ctx
        self.transcript.append(self.initial_polynomial.convert_to_bytes())
        self.transcript.append(ctx.to_bytes_be(self.initial_claimed_sum))

        # one fused device program per round (fold prev challenge + half-sums
        # + Montgomery demotion); the final fold is skipped -- the reference
        # computes it too but its result never reaches proof or transcript
        current = self.initial_polynomial.table
        n = self.initial_polynomial.number_of_variables
        round_polys = []
        univ_plain = round0_univariate(ctx, current)
        for rnd in range(n):
            u0, u1 = ctx.to_ints(univ_plain, mont=False)
            round_polys.append(MultilinearPolynomial.from_ints(ctx, [u0, u1]))
            self.transcript.append(limbs_to_bytes_be(ctx, univ_plain))
            challenge = self.transcript.random_challenge_as_field_element(ctx)
            if rnd < n - 1:
                univ_plain, current = fused_round(ctx, current, ctx.scalar(challenge))

        return SumcheckProof(
            initial_polynomial=self.initial_polynomial,
            initial_claimed_sum=self.initial_claimed_sum,
            round_univariate_polynomials=round_polys,
        )


class Verifier:
    def __init__(self):
        self.transcript = Transcript()

    @classmethod
    def init(cls) -> "Verifier":
        return cls()

    def verify(self, proof: SumcheckProof) -> bool:
        ctx = proof.initial_polynomial.ctx
        p = ctx.p
        if len(proof.round_univariate_polynomials) != proof.initial_polynomial.number_of_variables:
            return False

        current_claim = proof.initial_claimed_sum % p
        self.transcript.append(proof.initial_polynomial.convert_to_bytes())
        self.transcript.append(ctx.to_bytes_be(proof.initial_claimed_sum))

        challenges = []
        for univariate in proof.round_univariate_polynomials:
            u0, u1 = univariate.to_ints()
            if (u0 + u1) % p != current_claim:
                return False
            self.transcript.append(univariate.convert_to_bytes())
            r = self.transcript.random_challenge_as_field_element(ctx)
            challenges.append(r)
            # evaluate the 2-point eval-form univariate at r: u0 + r*(u1-u0)
            current_claim = (u0 + r * (u1 - u0)) % p

        final_evaluation = proof.initial_polynomial.evaluate(challenges)
        return final_evaluation == current_claim
