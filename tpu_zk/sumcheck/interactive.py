"""Round-by-round interactive sumcheck simulation (true-random verifier).

Reference parity:
``sumcheck_protocol/src/basic_sumcheck/sumcheck_interactive_simulation.rs``
(Prover :5-44, split_polynomial_and_sum_each :47-62, Verifier :66-113).
Kept for pedagogy and as an extra protocol test harness; reuses the same
device kernels as the non-interactive prover.
"""

from __future__ import annotations

import secrets

from ..fields.arith import FieldCtx
from ..poly.multilinear import MultilinearPolynomial, fold, sum_halves


class Prover:
    def __init__(self, polynomial: MultilinearPolynomial):
        self.ctx = polynomial.ctx
        self.initial_polynomial = polynomial
        self.initial_claimed_sum = polynomial.sum()
        self.current = polynomial.table
        self.round = 0

    def prove(self, random_challenge: int):
        ctx = self.ctx
        if self.round == 0:
            self.round += 1
            univ = MultilinearPolynomial(ctx, sum_halves(ctx, self.current)).to_ints()
            return self.initial_claimed_sum, univ
        self.current = fold(ctx, self.current, 0, ctx.scalar(random_challenge))
        self.round += 1
        poly = MultilinearPolynomial(ctx, self.current)
        new_claim = poly.sum()
        if self.current.shape[0] == 1:
            # reference split_at(0): empty left half sums to 0
            univ = [0, poly.to_ints()[0]]
        else:
            univ = MultilinearPolynomial(ctx, sum_halves(ctx, self.current)).to_ints()
        return new_claim, univ


class Verifier:
    def __init__(self, polynomial: MultilinearPolynomial):
        self.ctx = polynomial.ctx
        self.initial_polynomial = polynomial
        self.current_claimed_sum = 0
        self.challenges: list[int] = []

    def verify(self, claimed_sum: int, univariate: list[int]) -> bool:
        if len(univariate) != 2:
            return False
        u0, u1 = univariate
        if (u0 + u1) % self.ctx.p != claimed_sum % self.ctx.p:
            return False
        self.current_claimed_sum = claimed_sum % self.ctx.p
        return True

    def generate_challenge(self) -> int:
        c = secrets.randbelow(self.ctx.p)
        self.challenges.append(c)
        return c

    def oracle_check(self) -> bool:
        return self.current_claimed_sum == self.initial_polynomial.evaluate(self.challenges)
