"""Sumcheck protocol tests (basic, interactive, GKR-variant)."""

import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.poly.composed import ProductPolynomial, SumPolynomial
from tpu_zk.poly.multilinear import MultilinearPolynomial
from tpu_zk.sumcheck import basic, gkr_sumcheck, interactive
from tpu_zk.transcript.fiat_shamir import Transcript
from tpu_zk.transcript.keccak import keccak256

FQ = field_ctx("bn254_fq")
FR_BLS = field_ctx("bls12_381_fr")


def mle(vals, ctx=FQ):
    return MultilinearPolynomial.from_ints(ctx, vals)


def test_prover_init():
    # basic_sumcheck/prover.rs:100-108
    prover = basic.Prover.init(FQ, [0, 0, 3, 8])
    assert prover.initial_claimed_sum == 11
    assert prover.initial_polynomial.to_ints() == [0, 0, 3, 8]


def test_basic_roundtrip():
    prover = basic.Prover.init(FQ, [0, 0, 3, 8])
    proof = prover.prove()
    assert basic.Verifier.init().verify(proof)


def test_basic_roundtrip_larger():
    vals = [(i * 7 + 3) % 97 for i in range(1 << 10)]
    proof = basic.Prover.init(FQ, vals).prove()
    assert basic.Verifier.init().verify(proof)


def test_basic_tampered_fails():
    prover = basic.Prover.init(FQ, [0, 0, 3, 8])
    proof = prover.prove()
    proof.initial_claimed_sum = 12
    assert not basic.Verifier.init().verify(proof)


def test_basic_transcript_first_challenge_golden():
    """Recompute round-0 challenge by hand: keccak(poly_be || sum_be || univ_be)."""
    vals = [0, 0, 3, 8]
    prover = basic.Prover.init(FQ, vals)
    proof = prover.prove()
    absorbed = b"".join(v.to_bytes(32, "big") for v in vals)
    absorbed += (11).to_bytes(32, "big")
    u0, u1 = proof.round_univariate_polynomials[0].to_ints()
    assert (u0, u1) == (0, 11)  # half-sums of [0,0,3,8]
    absorbed += u0.to_bytes(32, "big") + u1.to_bytes(32, "big")
    expected_r0 = int.from_bytes(keccak256(absorbed), "little") % FQ.p
    # replay prover transcript to extract its r0
    t = Transcript()
    t.append(absorbed)
    assert t.random_challenge_as_field_element(FQ) == expected_r0


def test_interactive_simulation():
    # sumcheck_interactive_simulation.rs:118-169 (bls12-381 Fr)
    vals = [0, 0, 2, 7, 3, 3, 6, 11]
    prover = interactive.Prover(mle(vals, FR_BLS))
    verifier = interactive.Verifier(mle(vals, FR_BLS))

    claimed_sum, univ = prover.prove(0)
    assert claimed_sum == 32
    assert verifier.verify(claimed_sum, univ)

    for _ in range(3):
        c = verifier.generate_challenge()
        claimed_sum, univ = prover.prove(c)
        assert verifier.verify(claimed_sum, univ)

    assert verifier.oracle_check()


def build_sum_poly(ctx=FQ):
    pp1 = ProductPolynomial.from_mles([mle([0, 0, 0, 2], ctx), mle([0, 0, 0, 3], ctx)])
    pp2 = ProductPolynomial.from_mles([mle([0, 0, 0, 2], ctx), mle([0, 0, 0, 3], ctx)])
    return SumPolynomial.from_products([pp1, pp2])


def test_generate_round_univariate_golden():
    # sumcheck_gkr_protocol.rs:163-186: expected [0, 12, 48]
    assert gkr_sumcheck.generate_round_univariate(build_sum_poly()) == [0, 12, 48]


def test_gkr_sumcheck_roundtrip():
    # sumcheck_gkr_protocol.rs:188-215
    sp = build_sum_poly()
    proof = gkr_sumcheck.prove(sp, 12, Transcript())
    result = gkr_sumcheck.verify(proof, Transcript(), FQ)
    assert result.is_proof_valid
    assert result.random_challenges == proof.random_challenges


def test_gkr_sumcheck_bad_claim_fails():
    sp = build_sum_poly()
    proof = gkr_sumcheck.prove(sp, 13, Transcript())
    result = gkr_sumcheck.verify(proof, Transcript(), FQ)
    assert not result.is_proof_valid
