"""Succinct GKR (GKR + KZG inputs) round trips
(gkr/src/succinct_gkr_protocol.rs tests, over BLS12-381 Fr)."""

import pytest

from tpu_zk.circuit.layered import Circuit, Gate, Layer
from tpu_zk.fields.arith import field_ctx
from tpu_zk.gkr import succinct
from tpu_zk.kzg.trusted_setup import TrustedSetup, generate_values_for_tau

FR = field_ctx("bls12_381_fr")


def test_succinct_gkr_protocol1():
    # succinct_gkr_protocol.rs:302-324
    circuit = Circuit(FR, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])
    inputs = [2, 3, 4, 5]
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2])
    proof = succinct.prove_succinct(circuit, inputs, setup)
    assert succinct.verify_succinct(circuit, proof, setup)


@pytest.mark.slow
def test_succinct_gkr_protocol2():
    # succinct_gkr_protocol.rs:327-366
    circuit = Circuit(FR, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.mul(0, 1, 0), Gate.add(2, 3, 1)]),
        Layer([Gate.add(0, 1, 0), Gate.add(2, 3, 1), Gate.add(4, 5, 2), Gate.add(6, 7, 3)]),
    ])
    inputs = [1, 2, 3, 4, 5, 6, 7, 8]
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2, 3])
    proof = succinct.prove_succinct(circuit, inputs, setup)
    assert succinct.verify_succinct(circuit, proof, setup)


@pytest.mark.slow
def test_succinct_gkr_random_taus():
    # succinct_gkr_protocol.rs:369-405
    circuit = Circuit(FR, [
        Layer([Gate.add(0, 1, 0)]),
        Layer([Gate.mul(0, 1, 0), Gate.add(2, 3, 1)]),
        Layer([Gate.add(0, 1, 0), Gate.add(2, 3, 1), Gate.add(4, 5, 2), Gate.add(6, 7, 3)]),
    ])
    inputs = [1, 2, 3, 4, 5, 6, 7, 8]
    taus = generate_values_for_tau("bls12_381", 3)
    setup = TrustedSetup.initialize_setup("bls12_381", taus)
    proof = succinct.prove_succinct(circuit, inputs, setup)
    assert succinct.verify_succinct(circuit, proof, setup)


def test_succinct_gkr_tampered_fails():
    circuit = Circuit(FR, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])
    inputs = [2, 3, 4, 5]
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2])
    proof = succinct.prove_succinct(circuit, inputs, setup)
    # (top-level claimed_sum is carried but never read by verify, exactly as in
    # the reference; tamper a value the verifier actually checks)
    proof.sumcheck_proofs[0].claimed_sum = (
        proof.sumcheck_proofs[0].claimed_sum + 1
    ) % FR.p
    assert not succinct.verify_succinct(circuit, proof, setup)
