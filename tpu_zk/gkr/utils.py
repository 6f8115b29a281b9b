"""GKR helper kit (reference ``gkr/src/utils.rs``)."""

from __future__ import annotations

from ..fields.arith import FieldCtx
from ..poly.composed import ProductPolynomial, SumPolynomial
from ..poly.multilinear import MultilinearPolynomial


def compute_fbc_polynomial(
    add_i_bc: MultilinearPolynomial,
    mul_i_bc: MultilinearPolynomial,
    w_b: MultilinearPolynomial,
    w_c: MultilinearPolynomial,
) -> SumPolynomial:
    """f(b,c) = add_i(b,c)*(wb+wc) + mul_i(b,c)*(wb*wc)  (utils.rs:8-21)."""
    add_wbc = w_b.tensor_add(w_c)
    mul_wbc = w_b.tensor_mul(w_c)
    add_term = ProductPolynomial.from_mles([add_i_bc, add_wbc])
    mul_term = ProductPolynomial.from_mles([mul_i_bc, mul_wbc])
    return SumPolynomial.from_products([add_term, mul_term])


def compute_new_add_i_mul_i(
    alpha: int,
    beta: int,
    add_i_abc: MultilinearPolynomial,
    mul_i_abc: MultilinearPolynomial,
    rb_values: list[int],
    rc_values: list[int],
):
    """alpha/beta-fold of the wiring MLEs at rb, rc (utils.rs:23-68)."""
    add_rb_bc = add_i_abc.partial_evaluate(0, rb_values[0])
    add_rc_bc = add_i_abc.partial_evaluate(0, rc_values[0])
    mul_rb_bc = mul_i_abc.partial_evaluate(0, rb_values[0])
    mul_rc_bc = mul_i_abc.partial_evaluate(0, rc_values[0])

    for rb in rb_values[1:]:
        add_rb_bc = add_rb_bc.partial_evaluate(0, rb)
        mul_rb_bc = mul_rb_bc.partial_evaluate(0, rb)
    for rc in rc_values[1:]:
        add_rc_bc = add_rc_bc.partial_evaluate(0, rc)
        mul_rc_bc = mul_rc_bc.partial_evaluate(0, rc)

    new_add_i = add_rb_bc.scalar_mul(alpha).add(add_rc_bc.scalar_mul(beta))
    new_mul_i = mul_rb_bc.scalar_mul(alpha).add(mul_rc_bc.scalar_mul(beta))
    return new_add_i, new_mul_i


def evaluate_wb_wc(
    wb_poly: MultilinearPolynomial,
    wc_poly: MultilinearPolynomial,
    sumcheck_challenges: list[int],
):
    """Split challenges in half; evaluate wb at rb, wc at rc (utils.rs:70-82)."""
    middle = len(sumcheck_challenges) // 2
    rb_values = sumcheck_challenges[:middle]
    rc_values = sumcheck_challenges[middle:]
    return wb_poly.evaluate(rb_values), wc_poly.evaluate(rc_values)


def compute_verifier_initial_claim(
    circuit,
    layer_index: int,
    initial_random_challenge: int,
    sumcheck_challenges: list[int],
    wb_evaluation: int,
    wc_evaluation: int,
) -> int:
    """utils.rs:84-111."""
    ctx: FieldCtx = circuit.ctx
    add_i_abc, mul_i_abc = circuit.add_i_and_mul_i_mle(layer_index)
    add_i_bc = add_i_abc.partial_evaluate(0, initial_random_challenge)
    mul_i_bc = mul_i_abc.partial_evaluate(0, initial_random_challenge)
    add_i_r = add_i_bc.evaluate(sumcheck_challenges)
    mul_i_r = mul_i_bc.evaluate(sumcheck_challenges)
    return (
        add_i_r * (wb_evaluation + wc_evaluation)
        + mul_i_r * (wb_evaluation * wc_evaluation)
    ) % ctx.p


def compute_verifier_folded_claim(
    circuit,
    layer_index: int,
    current_sumcheck_challenges: list[int],
    previous_sumcheck_challenges: list[int],
    wb_evaluation: int,
    wc_evaluation: int,
    alpha: int,
    beta: int,
) -> int:
    """utils.rs:113-135."""
    ctx: FieldCtx = circuit.ctx
    mid = len(previous_sumcheck_challenges) // 2
    prev_rb = previous_sumcheck_challenges[:mid]
    prev_rc = previous_sumcheck_challenges[mid:]
    add_i_abc, mul_i_abc = circuit.add_i_and_mul_i_mle(layer_index)
    new_add_i, new_mul_i = compute_new_add_i_mul_i(
        alpha, beta, add_i_abc, mul_i_abc, prev_rb, prev_rc
    )
    add_r = new_add_i.evaluate(current_sumcheck_challenges)
    mul_r = new_mul_i.evaluate(current_sumcheck_challenges)
    return (
        add_r * (wb_evaluation + wc_evaluation)
        + mul_r * (wb_evaluation * wc_evaluation)
    ) % ctx.p
