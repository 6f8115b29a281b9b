"""Degree-aware sumcheck over composed SumPolynomials (the GKR inner loop).

Per round: evaluate the round univariate at ``degree+1`` sample points by
folding the whole stacked ``[p, k, N, L]`` working set at t = 0..degree
(independent folds -> batched on device), collapse elementwise and grand-sum;
interpolate to coefficient form on the host; absorb **little-endian**
coefficient bytes; squeeze; fold at the challenge.

Reference parity: ``sumcheck_protocol/src/gkr_sumcheck/sumcheck_gkr_protocol.rs``
(prove :24-67, verify :69-106, generate_round_univariate :113-143,
univariate_to_bytes LE :145-150, field_element_to_bytes BE :152-154).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.composed import SumPolynomial, collapse_sum_of_products
from ..poly.multilinear import fold
from ..poly.univariate import DenseUnivariatePolynomial
from ..transcript.fiat_shamir import Transcript


@dataclass
class SumcheckProverProof:
    claimed_sum: int
    round_univariate_polynomials: list[DenseUnivariatePolynomial]
    random_challenges: list[int]


@dataclass
class SumcheckVerifierProof:
    is_proof_valid: bool
    random_challenges: list[int]
    last_claimed_sum: int


@functools.partial(jax.jit, static_argnums=(0,))
def _round_evals(ctx: FieldCtx, stacked: jnp.ndarray) -> jnp.ndarray:
    """[p, k, N, L] -> [degree+1, L] plain-form round-univariate evaluations
    (folds at t = 0..degree batched into one device program)."""
    degree = stacked.shape[1]
    outs = []
    for t in range(degree + 1):
        folded = fold(ctx, stacked, 0, ctx.scalar(t))
        collapsed = collapse_sum_of_products(ctx, folded)
        outs.append(arith.sum_mod(ctx, collapsed))
    return arith.from_mont(ctx, jnp.stack(outs))


@functools.partial(jax.jit, static_argnums=(0,))
def _fused_round(ctx: FieldCtx, stacked: jnp.ndarray, r: jnp.ndarray):
    """Fold the previous challenge + produce the next round's evaluations in
    ONE device program (host round trips dominate protocol latency)."""
    folded = fold(ctx, stacked, 0, r)
    return _round_evals(ctx, folded), folded


def generate_round_univariate(sum_polynomial: SumPolynomial) -> list[int]:
    """Evaluations of the round univariate at t = 0..degree (canonical ints).

    Mirrors sumcheck_gkr_protocol.rs:113-143.
    """
    ctx = sum_polynomial.ctx
    return ctx.to_ints(_round_evals(ctx, sum_polynomial.stacked), mont=False)


def prove(
    sum_polynomial: SumPolynomial,
    claimed_sum: int,
    transcript: Transcript,
    fused: bool = True,
    absorb_claim: bool = True,
) -> SumcheckProverProof:
    """absorb_claim=False continues an in-flight sumcheck (the sparse GKR
    prover runs one logical sumcheck as two phase-wise working sets)."""
    ctx = sum_polynomial.ctx
    number_of_variables = sum_polynomial.number_of_variables
    degree = sum_polynomial.degree

    if absorb_claim:
        transcript.append(ctx.to_bytes_be(claimed_sum))

    if fused:
        return _prove_fused(sum_polynomial, claimed_sum, transcript)

    # unfused fallback: one device program + one host Fiat-Shamir sync per
    # round (the reference's execution shape; kept for pedagogy/tests)
    round_polys: list[DenseUnivariatePolynomial] = []
    random_challenges: list[int] = []
    current = sum_polynomial.stacked

    x_values = list(range(degree + 1))
    evals_plain = _round_evals(ctx, current)
    for rnd in range(number_of_variables):
        evaluations = ctx.to_ints(evals_plain, mont=False)
        univariate = DenseUnivariatePolynomial.lagrange_interpolate(ctx, x_values, evaluations)
        transcript.append(univariate.to_bytes_le())
        round_polys.append(univariate)

        r = transcript.random_challenge_as_field_element(ctx)
        random_challenges.append(r)
        if rnd < number_of_variables - 1:
            evals_plain, current = _fused_round(ctx, current, ctx.scalar(r))

    return SumcheckProverProof(
        claimed_sum=claimed_sum,
        round_univariate_polynomials=round_polys,
        random_challenges=random_challenges,
    )


def _prove_fused(
    sum_polynomial: SumPolynomial, claimed_sum: int, transcript: Transcript
) -> SumcheckProverProof:
    """All rounds + Fiat-Shamir in ONE device dispatch (sumcheck/fused.py);
    bit-identical transcript bytes to the unfused path."""
    import numpy as np

    from ..transcript.device_fs import DeviceSponge
    from .fused import final_pos, fused_gkr_sumcheck_prove

    ctx = sum_polynomial.ctx
    n = sum_polynomial.number_of_variables
    degree = sum_polynomial.degree

    sponge = DeviceSponge.from_host(transcript._hasher)
    coeffs_plain, digests, state, buf = fused_gkr_sumcheck_prove(
        ctx, sum_polynomial.stacked, sponge.state, sponge.buf, sponge.pos
    )
    coeffs_np, digests_np, state_np, buf_np = jax.device_get(
        (coeffs_plain, digests, state, buf)
    )
    flat = ctx.to_ints(coeffs_np.reshape(-1, ctx.L), mont=False)
    width = degree + 1
    round_polys = [
        DenseUnivariatePolynomial(ctx, flat[i * width : (i + 1) * width]) for i in range(n)
    ]
    random_challenges = [
        ctx.from_le_bytes_mod_order(bytes(d.astype(np.uint8).tobytes())) for d in digests_np
    ]
    pos = final_pos(sponge.pos, n, width * ctx.nbytes)
    transcript._hasher = DeviceSponge(None, None, pos).to_host(
        np.asarray(state_np), np.asarray(buf_np)
    )
    return SumcheckProverProof(
        claimed_sum=claimed_sum,
        round_univariate_polynomials=round_polys,
        random_challenges=random_challenges,
    )


def verify(proof: SumcheckProverProof, transcript: Transcript, ctx: FieldCtx) -> SumcheckVerifierProof:
    transcript.append(ctx.to_bytes_be(proof.claimed_sum))

    current_sum = proof.claimed_sum % ctx.p
    random_challenges: list[int] = []

    for round_polynomial in proof.round_univariate_polynomials:
        eval_at_zero = round_polynomial.evaluate(0)
        eval_at_one = round_polynomial.evaluate(1)
        if (eval_at_zero + eval_at_one) % ctx.p != current_sum:
            return SumcheckVerifierProof(False, [], current_sum)

        transcript.append(round_polynomial.to_bytes_le())
        r = transcript.random_challenge_as_field_element(ctx)
        current_sum = round_polynomial.evaluate(r)
        random_challenges.append(r)

    return SumcheckVerifierProof(True, random_challenges, current_sum)
