"""Succinct GKR: GKR with a multilinear-KZG commitment to the input layer.

Reference parity: ``gkr/src/succinct_gkr_protocol.rs`` (SuccinctProof :22-32,
prove_succinct :35-169, verify_succinct :172-284).  Differences from plain
GKR: the prover commits to the input MLE up front, retains rb/rc from the
*last* layer's sumcheck, and appends two KZG opening proofs; the verifier
skips the per-layer claim check on the last layer and instead checks the two
KZG openings; wb/wc transcript absorbs still happen every layer (zero for the
last one).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..circuit.layered import Circuit
from ..kzg import multilinear_kzg
from ..kzg.trusted_setup import TrustedSetup
from ..poly.multilinear import MultilinearPolynomial
from ..sumcheck import gkr_sumcheck
from ..sumcheck.gkr_sumcheck import SumcheckProverProof
from ..transcript.fiat_shamir import Transcript
from .protocol import _w0_padded
from .wiring import (
    WiringPair,
    expected_layer_claim,
    layer_polynomial,
    split_half_evaluations,
)


@dataclass
class SuccinctProof:
    circuit_output: list[int]
    claimed_sum: int
    sumcheck_proofs: list[SumcheckProverProof]
    wb_evaluations: list[int]
    wc_evaluations: list[int]
    input_polynomial_commitment: tuple  # affine G1
    input_rb_proof: multilinear_kzg.MultilinearKZGProof
    input_rc_proof: multilinear_kzg.MultilinearKZGProof


def prove_succinct(circuit: Circuit, inputs, trusted_setup: TrustedSetup) -> SuccinctProof:
    ctx = circuit.ctx
    circuit_evaluation = circuit.evaluate(list(inputs))

    input_polynomial = MultilinearPolynomial.from_ints(ctx, list(inputs))
    input_commitment = multilinear_kzg.commit_to_polynomial(input_polynomial, trusted_setup)

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
        wc_poly = wb_poly

        fbc_polynomial = layer_polynomial(add_i_bc, mul_i_bc, wb_poly, wc_poly)
        sumcheck_proof = gkr_sumcheck.prove(fbc_polynomial, claimed_sum, transcript)
        layer_proofs.append(sumcheck_proof)

        # rb/rc retained from EVERY layer incl. the last (succinct_gkr :119-126)
        sumcheck_challenges = sumcheck_proof.random_challenges
        middle = len(sumcheck_challenges) // 2
        rb_values = sumcheck_challenges[:middle]
        rc_values = sumcheck_challenges[middle:]

        if layer_index < len(circuit.layers) - 1:
            wb_evaluation, wc_evaluation = split_half_evaluations(
                wb_poly, wc_poly, sumcheck_challenges
            )
            wb_evaluations.append(wb_evaluation)
            wc_evaluations.append(wc_evaluation)

            transcript.append(ctx.to_bytes_be(wb_evaluation))
            alpha = transcript.random_challenge_as_field_element(ctx)
            transcript.append(ctx.to_bytes_be(wc_evaluation))
            beta = transcript.random_challenge_as_field_element(ctx)

            claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    input_rb_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rb_values)
    input_rc_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rc_values)

    return SuccinctProof(
        circuit_output=circuit_evaluation.output,
        claimed_sum=claimed_sum,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evaluations,
        wc_evaluations=wc_evaluations,
        input_polynomial_commitment=input_commitment,
        input_rb_proof=input_rb_proof,
        input_rc_proof=input_rc_proof,
    )


def verify_succinct(circuit: Circuit, proof: SuccinctProof, trusted_setup: TrustedSetup) -> bool:
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

        verify_result = gkr_sumcheck.verify(proof.sumcheck_proofs[layer_index], transcript, ctx)
        if not verify_result.is_proof_valid:
            return False

        sumcheck_challenges = verify_result.random_challenges

        wb_evaluation = 0
        wc_evaluation = 0
        if layer_index < len(circuit.layers) - 1:
            wb_evaluation = proof.wb_evaluations[layer_index]
            wc_evaluation = proof.wc_evaluations[layer_index]

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

    mid = len(prev_sumcheck_challenges) // 2
    rb_values = prev_sumcheck_challenges[:mid]
    rc_values = prev_sumcheck_challenges[mid:]

    wb_verification = multilinear_kzg.verify(
        trusted_setup, proof.input_polynomial_commitment, rb_values, proof.input_rb_proof
    )
    wc_verification = multilinear_kzg.verify(
        trusted_setup, proof.input_polynomial_commitment, rc_values, proof.input_rc_proof
    )
    return wb_verification and wc_verification
