"""Wiring-predicate MLEs (add_i / mul_i) for the GKR layer relation.

TPU design: the two wiring tables of a layer travel as ONE stacked
``[2, N, L]`` device array (axis 0 = add/mul), so every fold, scalar-mul and
evaluation is a single batched kernel over both tables at once -- half the
dispatches of folding them separately, and XLA sees one fusible program per
protocol step.  The GKR layer relation itself,

    f_r(b, c) = add_r(b, c) * (w(b) + w(c)) + mul_r(b, c) * (w(b) * w(c)),

is kept *factored* as a 2-term SumPolynomial (`layer_polynomial`) rather
than materialized, so the sumcheck folds all four member MLEs per round in
one batch.  Functional parity targets in the reference: the free helpers of
``gkr/src/utils.rs`` (fbc assembly :8-21, alpha/beta wiring fold :23-68,
half-split evaluation :70-82, verifier claims :84-135).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.composed import ProductPolynomial, SumPolynomial
from ..poly.multilinear import MultilinearPolynomial, fold


def _as_mont_vec(ctx: FieldCtx, value):
    if isinstance(value, (int, np.integer)):
        return ctx.scalar(int(value))
    return value  # already a Montgomery [L] limb vector


class WiringPair:
    """A layer's ``add_i`` / ``mul_i`` MLEs as one ``[2, N, L]`` table."""

    def __init__(self, ctx: FieldCtx, stacked: jnp.ndarray):
        self.ctx = ctx
        self.stacked = stacked  # [2, N, L]

    # -- constructors ---------------------------------------------------------
    @classmethod
    def of(cls, add_i: MultilinearPolynomial, mul_i: MultilinearPolynomial) -> "WiringPair":
        return cls(add_i.ctx, jnp.stack([add_i.table, mul_i.table]))

    @classmethod
    def for_layer(cls, circuit, layer_index: int) -> "WiringPair":
        return cls.of(*circuit.add_i_and_mul_i_mle(layer_index))

    # -- batched table ops ----------------------------------------------------
    def fold_first_vars(self, points) -> "WiringPair":
        """Fold variable 0 at each point in turn -- both tables per dispatch."""
        t = self.stacked
        for p in points:
            t = fold(self.ctx, t, 0, _as_mont_vec(self.ctx, p))
        return WiringPair(self.ctx, t)

    def linear_combine(self, alpha, other: "WiringPair", beta) -> "WiringPair":
        """``alpha * self + beta * other`` elementwise, batched over the pair."""
        a = arith.mont_mul(self.ctx, self.stacked, _as_mont_vec(self.ctx, alpha))
        b = arith.mont_mul(self.ctx, other.stacked, _as_mont_vec(self.ctx, beta))
        return WiringPair(self.ctx, arith.add(self.ctx, a, b))

    def alpha_beta_fold(self, alpha, beta, rb_values, rc_values) -> "WiringPair":
        """``alpha * pair(rb, ., .) + beta * pair(rc, ., .)``.

        This is how GKR reduces the two outstanding claims (at rb and rc)
        back to a single wiring pair for the next layer's sumcheck.  Both
        tables fold together per point (stacked batch), so it costs
        ``len(rb) + len(rc)`` fused fold dispatches plus one combine where
        the reference runs 4x that in separate scalar passes
        (``gkr/src/utils.rs:23-68``).
        """
        return self.fold_first_vars(rb_values).linear_combine(
            alpha, self.fold_first_vars(rc_values), beta
        )

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


def gate_claim(ctx: FieldCtx, add_r: int, mul_r: int, wb: int, wc: int) -> int:
    """The GKR layer relation ``add_i(r)*(wb+wc) + mul_i(r)*(wb*wc)``."""
    return (add_r * (wb + wc) + mul_r * (wb * wc)) % ctx.p


def layer_polynomial(
    add_i_bc: MultilinearPolynomial,
    mul_i_bc: MultilinearPolynomial,
    w_b: MultilinearPolynomial,
    w_c: MultilinearPolynomial,
) -> SumPolynomial:
    """Assemble f(b,c) as a factored 2-term SumPolynomial (parity:
    ``gkr/src/utils.rs:8-21``).

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


def split_half_evaluations(
    wb_poly: MultilinearPolynomial,
    wc_poly: MultilinearPolynomial,
    sumcheck_challenges,
):
    """Evaluate the layer-below MLE at the b-half and c-half of the sumcheck
    challenge point (parity: ``gkr/src/utils.rs:70-82``)."""
    half = len(sumcheck_challenges) // 2
    return (
        wb_poly.evaluate(sumcheck_challenges[:half]),
        wc_poly.evaluate(sumcheck_challenges[half:]),
    )


def expected_layer_claim(
    circuit,
    layer_index: int,
    sumcheck_challenges,
    wb_evaluation: int,
    wc_evaluation: int,
    *,
    initial_random_challenge=None,
    previous_sumcheck_challenges=None,
    alpha=None,
    beta=None,
) -> int:
    """The verifier's recomputed claim for one GKR layer.

    Layer 0 (pass ``initial_random_challenge``): evaluate the wiring pair at
    ``(ra, r_bc)`` and apply the gate relation (parity:
    ``gkr/src/utils.rs:84-111``).  Deeper layers (pass the previous round's
    challenges and ``alpha``/``beta``): alpha/beta-fold the wiring pair at
    the previous (rb, rc) first (parity: ``gkr/src/utils.rs:113-135``).

    Note the verifier rebuilds and folds the full wiring tables here -- like
    the reference, this verifier is NOT succinct in circuit size; the sparse
    path (``tpu_zk/gkr/sparse.py``) is.
    """
    pair = WiringPair.for_layer(circuit, layer_index)
    if initial_random_challenge is not None:
        points = [initial_random_challenge, *sumcheck_challenges]
        add_r, mul_r = pair.evaluate(points)
    else:
        half = len(previous_sumcheck_challenges) // 2
        folded = pair.alpha_beta_fold(
            alpha,
            beta,
            previous_sumcheck_challenges[:half],
            previous_sumcheck_challenges[half:],
        )
        add_r, mul_r = folded.evaluate(sumcheck_challenges)
    return gate_claim(circuit.ctx, add_r, mul_r, wb_evaluation, wc_evaluation)
