"""Wiring-table helpers shared by the GKR prover and verifier.

TPU design note: the reference (``gkr/src/utils.rs``) treats ``add_i`` and
``mul_i`` as two independent MLEs and folds each one separately with scalar
loops.  Here the pair travels as ONE stacked ``[2, N, L]`` device array
(axis 0 = add/mul), so every fold, scalar-mul and evaluation below is a
single batched kernel over both tables at once -- half the dispatches, and
XLA sees one fusible program per protocol step.  Functional parity targets
are cited per function.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.composed import ProductPolynomial, SumPolynomial
from ..poly.multilinear import MultilinearPolynomial, fold


class WiringPair:
    """``add_i`` and ``mul_i`` stacked as one ``[2, N, L]`` Montgomery table."""

    def __init__(self, ctx: FieldCtx, stacked: jnp.ndarray):
        self.ctx = ctx
        self.stacked = stacked  # [2, N, L]

    @classmethod
    def of(cls, add_i: MultilinearPolynomial, mul_i: MultilinearPolynomial) -> "WiringPair":
        return cls(add_i.ctx, jnp.stack([add_i.table, mul_i.table]))

    def fold_first_vars(self, points) -> "WiringPair":
        """Fold variable 0 at each point in turn -- both tables per dispatch."""
        t = self.stacked
        for p in points:
            t = fold(self.ctx, t, 0, _scalar(self.ctx, p))
        return WiringPair(self.ctx, t)

    def linear_combine(self, alpha, other: "WiringPair", beta) -> "WiringPair":
        """``alpha * self + beta * other`` elementwise, batched over the pair."""
        a = arith.mont_mul(self.ctx, self.stacked, _scalar(self.ctx, alpha))
        b = arith.mont_mul(self.ctx, other.stacked, _scalar(self.ctx, beta))
        return WiringPair(self.ctx, arith.add(self.ctx, a, b))

    def evaluate(self, points):
        """Fold everything; return canonical ints ``(add_i(r), mul_i(r))``."""
        t = self.fold_first_vars(points).stacked  # [2, 1, L]
        vals = self.ctx.to_ints(t[:, 0, :])
        return int(vals[0]), int(vals[1])

    def split(self):
        add_t, mul_t = self.stacked[0], self.stacked[1]
        return (
            MultilinearPolynomial(self.ctx, add_t),
            MultilinearPolynomial(self.ctx, mul_t),
        )


def _scalar(ctx: FieldCtx, value):
    if isinstance(value, (int, np.integer)):
        return ctx.scalar(int(value))
    return value  # already a Montgomery [L] limb vector


def gate_claim(ctx: FieldCtx, add_r: int, mul_r: int, wb: int, wc: int) -> int:
    """The GKR layer relation ``add_i(r)*(wb+wc) + mul_i(r)*(wb*wc)``."""
    return (add_r * (wb + wc) + mul_r * (wb * wc)) % ctx.p


def compute_fbc_polynomial(
    add_i_bc: MultilinearPolynomial,
    mul_i_bc: MultilinearPolynomial,
    w_b: MultilinearPolynomial,
    w_c: MultilinearPolynomial,
) -> SumPolynomial:
    """Assemble the layer polynomial f(b,c) as a 2-term SumPolynomial without
    materializing the product (functional parity: ``gkr/src/utils.rs:8-21``).

    The ``|wb| x |wc|`` outer tables are built on device (`tensor_add` /
    `tensor_mul` are single broadcasted kernels); the add/mul terms stay
    factored so the sumcheck can fold all four MLEs per round in one batch.
    """
    return SumPolynomial.from_products(
        [
            ProductPolynomial.from_mles([add_i_bc, w_b.tensor_add(w_c)]),
            ProductPolynomial.from_mles([mul_i_bc, w_b.tensor_mul(w_c)]),
        ]
    )


def compute_new_add_i_mul_i(
    alpha,
    beta,
    add_i_abc: MultilinearPolynomial,
    mul_i_abc: MultilinearPolynomial,
    rb_values,
    rc_values,
):
    """Fold the layer's wiring pair at rb and rc, then alpha/beta-combine:
    ``new_add_i = alpha*add_i(rb,.,.) + beta*add_i(rc,.,.)`` and likewise for
    mul_i (functional parity: ``gkr/src/utils.rs:23-68``).

    Both tables fold together per point (stacked batch), so this costs
    ``len(rb)+len(rc)`` fused fold dispatches plus one combine -- the
    reference's version is 4x that in separate scalar passes.
    """
    pair = WiringPair.of(add_i_abc, mul_i_abc)
    at_rb = pair.fold_first_vars(rb_values)
    at_rc = pair.fold_first_vars(rc_values)
    return at_rb.linear_combine(alpha, at_rc, beta).split()


def evaluate_wb_wc(
    wb_poly: MultilinearPolynomial,
    wc_poly: MultilinearPolynomial,
    sumcheck_challenges,
):
    """Evaluate the layer-below MLE at the b-half and c-half of the sumcheck
    challenge point (functional parity: ``gkr/src/utils.rs:70-82``)."""
    half = len(sumcheck_challenges) // 2
    return (
        wb_poly.evaluate(sumcheck_challenges[:half]),
        wc_poly.evaluate(sumcheck_challenges[half:]),
    )


def compute_verifier_initial_claim(
    circuit,
    layer_index: int,
    initial_random_challenge,
    sumcheck_challenges,
    wb_evaluation: int,
    wc_evaluation: int,
) -> int:
    """Layer-0 expected claim: evaluate the wiring pair at (ra, r_bc) and
    apply the gate relation (functional parity: ``gkr/src/utils.rs:84-111``)."""
    pair = WiringPair.of(*circuit.add_i_and_mul_i_mle(layer_index))
    points = [initial_random_challenge, *sumcheck_challenges]
    add_r, mul_r = pair.evaluate(points)
    return gate_claim(circuit.ctx, add_r, mul_r, wb_evaluation, wc_evaluation)


def compute_verifier_folded_claim(
    circuit,
    layer_index: int,
    current_sumcheck_challenges,
    previous_sumcheck_challenges,
    wb_evaluation: int,
    wc_evaluation: int,
    alpha,
    beta,
) -> int:
    """Deeper-layer expected claim: alpha/beta-fold the wiring pair at the
    previous round's (rb, rc), evaluate at the current challenges, apply the
    gate relation (functional parity: ``gkr/src/utils.rs:113-135``)."""
    half = len(previous_sumcheck_challenges) // 2
    pair = WiringPair.of(*circuit.add_i_and_mul_i_mle(layer_index))
    folded = pair.fold_first_vars(previous_sumcheck_challenges[:half]).linear_combine(
        alpha, pair.fold_first_vars(previous_sumcheck_challenges[half:]), beta
    )
    add_r, mul_r = folded.evaluate(current_sumcheck_challenges)
    return gate_claim(circuit.ctx, add_r, mul_r, wb_evaluation, wc_evaluation)
