"""Multilinear KZG tests (reference multilinear_kzg crate vectors)."""

import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.kzg.multilinear_kzg import commit_to_polynomial, open_and_prove, verify
from tpu_zk.kzg.trusted_setup import TrustedSetup, compute_lagrange_basis_device
from tpu_zk.poly.multilinear import MultilinearPolynomial

FR = field_ctx("bls12_381_fr")


def test_lagrange_basis_golden():
    # trusted_setup.rs:94-110: taus (5,2,3) -> [-8,12,16,-24,10,-15,-20,30]
    basis = compute_lagrange_basis_device(FR, [5, 2, 3])
    got = FR.to_ints(basis)
    expected = [(-8) % FR.p, 12, 16, (-24) % FR.p, 10, (-15) % FR.p, (-20) % FR.p, 30]
    assert got == expected
    # trusted_setup.rs:113-118: taus (5,2) -> [4,-8,-5,10]
    basis2 = compute_lagrange_basis_device(FR, [5, 2])
    assert FR.to_ints(basis2) == [4, (-8) % FR.p, (-5) % FR.p, 10]


def test_g1_powers_match_host():
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2])
    hc = setup.curve.host
    g = hc.g1_generator()
    expected = [hc.g1_affine(hc.g1_mul(g, k % FR.p)) for k in [4, -8, -5, 10]]
    assert setup.lagrange_basis_ints() == expected


def kzg_roundtrip(taus, values, opening):
    setup = TrustedSetup.initialize_setup("bls12_381", taus)
    poly = MultilinearPolynomial.from_ints(FR, [v % FR.p for v in values])
    commitment = commit_to_polynomial(poly, setup)
    proof = open_and_prove(poly, setup, [o % FR.p for o in opening])
    assert verify(setup, commitment, [o % FR.p for o in opening], proof)
    return setup, poly, commitment, proof


def test_multilinear_kzg1():
    # multilinear_kzg.rs:216-239
    kzg_roundtrip([5, 2, 3], [0, 4, 0, 4, 0, 4, 3, 7], [6, 4, 0])


def test_multilinear_kzg2():
    # multilinear_kzg.rs:242-266
    kzg_roundtrip([2, 3, 4], [0, 7, 0, 5, 0, 7, 4, 9], [5, 9, 6])


@pytest.mark.slow
def test_multilinear_kzg3_four_vars():
    # multilinear_kzg.rs:269-303
    kzg_roundtrip(
        [12, 9, 28, 40],
        [0, 0, 0, 2, 0, 0, 10, 12, 0, -12, 4, -6, 0, -12, 14, 4],
        [54, 90, 76, 160],
    )


def test_kzg_wrong_evaluation_fails():
    setup, poly, commitment, proof = kzg_roundtrip(
        [5, 2, 3], [0, 4, 0, 4, 0, 4, 3, 7], [6, 4, 0]
    )
    proof.evaluation = (proof.evaluation + 1) % FR.p
    assert not verify(setup, commitment, [6, 4, 0], proof)


def test_kzg_wrong_opening_fails():
    setup, poly, commitment, proof = kzg_roundtrip(
        [5, 2, 3], [0, 4, 0, 4, 0, 4, 3, 7], [6, 4, 0]
    )
    assert not verify(setup, commitment, [6, 4, 1], proof)


def test_kzg_padded_tail_msm_matches_unpadded():
    """Force the TPU-only pad-to-shared-shape branch on CPU: identity points
    + zero scalars must be exact no-ops, so the proof bytes are identical
    (multilinear_kzg.py pad branch; advisor r3 finding)."""
    from tpu_zk.kzg import multilinear_kzg as mk

    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2, 3])
    poly = MultilinearPolynomial.from_ints(FR, [0, 4, 0, 4, 0, 4, 3, 7])
    opening = [6, 4, 0]
    commitment = commit_to_polynomial(poly, setup)
    plain = open_and_prove(poly, setup, opening)
    old = mk.PAD_TAIL_MSMS
    mk.PAD_TAIL_MSMS = True
    try:
        padded = open_and_prove(poly, setup, opening)
    finally:
        mk.PAD_TAIL_MSMS = old
    assert padded.evaluation == plain.evaluation
    assert padded.proofs == plain.proofs
    assert verify(setup, commitment, opening, padded)
