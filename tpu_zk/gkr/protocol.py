"""The full GKR protocol over layered arithmetic circuits.

Host-side protocol driver; every per-layer table op (wiring-MLE folds, the
f(b,c) tensor terms, sumcheck rounds) runs as device kernels.

Reference parity: ``gkr/src/gkr_protocol.rs`` (Proof :16-23, prove :26-143,
verify :146-236).  Transcript absorb order per layer: w0 bytes -> ra;
sumcheck (claimed sum BE, LE round univariates); then wb eval BE -> alpha,
wc eval BE -> beta.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..circuit.layered import Circuit
from ..poly.multilinear import MultilinearPolynomial
from ..sumcheck import gkr_sumcheck
from ..sumcheck.gkr_sumcheck import SumcheckProverProof
from ..transcript.fiat_shamir import Transcript
from .wiring import (
    WiringPair,
    expected_layer_claim,
    layer_polynomial,
    split_half_evaluations,
)


@dataclass
class Proof:
    circuit_output: list[int]
    claimed_sum: int
    sumcheck_proofs: list[SumcheckProverProof]
    wb_evaluations: list[int]
    wc_evaluations: list[int]


def _w0_padded(ctx, output_values: list[int]) -> MultilinearPolynomial:
    vals = list(output_values)
    if len(vals) == 1:
        vals.append(0)  # pad to a 1-variable MLE (gkr_protocol.rs:42-47)
    return MultilinearPolynomial.from_ints(ctx, vals)


def prove(circuit: Circuit, inputs) -> Proof:
    ctx = circuit.ctx
    circuit_evaluation = circuit.evaluate(list(inputs))

    transcript = Transcript()
    layer_proofs: list[SumcheckProverProof] = []
    wb_evaluations: list[int] = []
    wc_evaluations: list[int] = []
    alpha = beta = 0
    rb_values: list[int] = []
    rc_values: list[int] = []

    w0_polynomial = _w0_padded(ctx, circuit_evaluation.output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        add_i_abc, mul_i_abc = circuit.add_i_and_mul_i_mle(layer_index)

        if layer_index == 0:
            add_i_bc = add_i_abc.partial_evaluate(0, random_challenge_a)
            mul_i_bc = mul_i_abc.partial_evaluate(0, random_challenge_a)
        else:
            add_i_bc, mul_i_bc = (
                WiringPair.of(add_i_abc, mul_i_abc)
                .alpha_beta_fold(alpha, beta, rb_values, rc_values)
                .split()
            )

        wb_poly = circuit.w_i_polynomial(circuit_evaluation, layer_index + 1)
        wc_poly = wb_poly  # wc == wb (gkr_protocol.rs:88-89)

        fbc_polynomial = layer_polynomial(add_i_bc, mul_i_bc, wb_poly, wc_poly)
        sumcheck_proof = gkr_sumcheck.prove(fbc_polynomial, claimed_sum, transcript)
        layer_proofs.append(sumcheck_proof)

        if layer_index < len(circuit.layers) - 1:
            sumcheck_challenges = sumcheck_proof.random_challenges
            wb_evaluation, wc_evaluation = split_half_evaluations(
                wb_poly, wc_poly, sumcheck_challenges
            )
            wb_evaluations.append(wb_evaluation)
            wc_evaluations.append(wc_evaluation)

            middle = len(sumcheck_challenges) // 2
            rb_values = sumcheck_challenges[:middle]
            rc_values = sumcheck_challenges[middle:]

            transcript.append(ctx.to_bytes_be(wb_evaluation))
            alpha = transcript.random_challenge_as_field_element(ctx)
            transcript.append(ctx.to_bytes_be(wc_evaluation))
            beta = transcript.random_challenge_as_field_element(ctx)

            claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    return Proof(
        circuit_output=circuit_evaluation.output,
        claimed_sum=claimed_sum,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evaluations,
        wc_evaluations=wc_evaluations,
    )


def verify(circuit: Circuit, proof: Proof, inputs) -> bool:
    ctx = circuit.ctx
    transcript = Transcript()
    alpha = beta = 0
    prev_sumcheck_challenges: list[int] = []

    w0_polynomial = _w0_padded(ctx, proof.circuit_output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        if claimed_sum != proof.sumcheck_proofs[layer_index].claimed_sum % ctx.p:
            return False

        verify_result = gkr_sumcheck.verify(
            proof.sumcheck_proofs[layer_index], transcript, ctx
        )
        if not verify_result.is_proof_valid:
            return False

        sumcheck_challenges = verify_result.random_challenges

        if layer_index < len(circuit.layers) - 1:
            wb_evaluation = proof.wb_evaluations[layer_index]
            wc_evaluation = proof.wc_evaluations[layer_index]
        else:
            wb_poly = MultilinearPolynomial.from_ints(ctx, list(inputs))
            wb_evaluation, wc_evaluation = split_half_evaluations(
                wb_poly, wb_poly, sumcheck_challenges
            )

        if layer_index == 0:
            expected_claim = expected_layer_claim(
                circuit,
                layer_index,
                sumcheck_challenges,
                wb_evaluation,
                wc_evaluation,
                initial_random_challenge=random_challenge_a,
            )
        else:
            expected_claim = expected_layer_claim(
                circuit,
                layer_index,
                sumcheck_challenges,
                wb_evaluation,
                wc_evaluation,
                previous_sumcheck_challenges=prev_sumcheck_challenges,
                alpha=alpha,
                beta=beta,
            )

        if expected_claim != verify_result.last_claimed_sum:
            return False

        prev_sumcheck_challenges = list(sumcheck_challenges)

        transcript.append(ctx.to_bytes_be(wb_evaluation))
        alpha = transcript.random_challenge_as_field_element(ctx)
        transcript.append(ctx.to_bytes_be(wc_evaluation))
        beta = transcript.random_challenge_as_field_element(ctx)

        claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    return True
