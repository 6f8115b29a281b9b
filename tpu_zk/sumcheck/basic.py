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

    def prove(self, fused: bool = True) -> SumcheckProof:
        ctx = self.ctx
        self.transcript.append(self.initial_polynomial.convert_to_bytes())
        self.transcript.append(ctx.to_bytes_be(self.initial_claimed_sum))

        n = self.initial_polynomial.number_of_variables
        if fused:
            return self._prove_fused(n)

        # unfused fallback: one device program + one host Fiat-Shamir sync per
        # round (the reference's execution shape; kept for pedagogy/tests)
        current = self.initial_polynomial.table
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

    def _prove_fused(self, n: int) -> SumcheckProof:
        """All rounds + Fiat-Shamir in ONE device dispatch (sumcheck/fused.py)."""
        import jax
        import numpy as np

        from ..transcript.device_fs import DeviceSponge
        from .fused import final_pos, fused_basic_prove

        ctx = self.ctx
        sponge = DeviceSponge.from_host(self.transcript._hasher)
        univs_plain, univs_mont, _digests, state, buf = fused_basic_prove(
            ctx, self.initial_polynomial.table, sponge.state, sponge.buf, sponge.pos
        )
        # round polys wrap device slices of the Montgomery stack -- no
        # per-round host transfers
        round_polys = [MultilinearPolynomial(ctx, univs_mont[i]) for i in range(n)]
        # re-sync the host transcript from the returned sponge state
        pos = final_pos(sponge.pos, n, 2 * ctx.nbytes)
        state_np, buf_np = jax.device_get((state, buf))
        self.transcript._hasher = DeviceSponge(None, None, pos).to_host(
            np.asarray(state_np), np.asarray(buf_np)
        )
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

        # one batched transfer for every round univariate (vs one blocking
        # device_get per round -- the tunnel costs ~35 ms per round trip)
        import jax.numpy as jnp

        stacked = jnp.stack([u.table for u in proof.round_univariate_polynomials])
        all_ints = ctx.to_ints(stacked)
        pairs = [all_ints[2 * i : 2 * i + 2] for i in range(len(all_ints) // 2)]

        challenges = []
        for univariate, (u0, u1) in zip(proof.round_univariate_polynomials, pairs):
            if (u0 + u1) % p != current_claim:
                return False
            self.transcript.append(ctx.to_bytes_be(u0) + ctx.to_bytes_be(u1))
            r = self.transcript.random_challenge_as_field_element(ctx)
            challenges.append(r)
            # evaluate the 2-point eval-form univariate at r: u0 + r*(u1-u0)
            current_claim = (u0 + r * (u1 - u0)) % p

        final_evaluation = proof.initial_polynomial.evaluate(challenges)
        return final_evaluation == current_claim
