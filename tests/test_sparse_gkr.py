"""Linear-time (sparse-wiring) GKR vs the dense pipeline.

The sparse prover must emit byte-identical proofs (same round univariates,
challenges, and evaluations) -- it computes the same sums analytically with
O(gates) bookkeeping instead of dense 2^(3i+2) wiring tables.
"""

from tpu_zk.circuit.layered import ADD, Circuit, Gate, Layer, tree_sum_circuit
from tpu_zk.fields.arith import field_ctx
from tpu_zk.gkr import protocol as dense
from tpu_zk.gkr import sparse

FR = field_ctx("bls12_381_fr")


def _circuits():
    return [
        (
            Circuit(FR, [
                Layer([Gate.mul(0, 1, 0)]),
                Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
            ]),
            [2, 3, 4, 5],
        ),
        (
            Circuit(FR, [
                Layer([Gate.add(0, 1, 0)]),
                Layer([Gate.mul(0, 1, 0), Gate.add(2, 3, 1)]),
                Layer([
                    Gate.add(0, 1, 0), Gate.add(2, 3, 1),
                    Gate.add(4, 5, 2), Gate.add(6, 7, 3),
                ]),
            ]),
            [1, 2, 3, 4, 5, 6, 7, 8],
        ),
    ]


def test_sparse_proof_matches_dense():
    for circuit, inputs in _circuits():
        pd = dense.prove(circuit, inputs)
        ps = sparse.prove(circuit, inputs)
        assert pd.circuit_output == ps.circuit_output
        assert pd.claimed_sum == ps.claimed_sum
        assert pd.wb_evaluations == ps.wb_evaluations
        assert pd.wc_evaluations == ps.wc_evaluations
        for a, b in zip(pd.sumcheck_proofs, ps.sumcheck_proofs):
            assert a.random_challenges == b.random_challenges
            assert [q.coefficients for q in a.round_univariate_polynomials] == [
                q.coefficients for q in b.round_univariate_polynomials
            ]


def test_sparse_cross_verification():
    circuit, inputs = _circuits()[1]
    pd = dense.prove(circuit, inputs)
    ps = sparse.prove(circuit, inputs)
    assert sparse.verify(circuit, ps, inputs)
    assert dense.verify(circuit, ps, inputs)
    assert sparse.verify(circuit, pd, inputs)


def test_sparse_tampered_fails():
    circuit, inputs = _circuits()[0]
    proof = sparse.prove(circuit, inputs)
    proof.sumcheck_proofs[0].claimed_sum = (
        proof.sumcheck_proofs[0].claimed_sum + 1
    ) % FR.p
    assert not sparse.verify(circuit, proof, inputs)


def test_sparse_tree_circuit():
    """A depth-5 balanced reduction (31 gates): beyond what the dense
    pipeline's 2^(3i+2) wiring tables handle comfortably at depth."""
    circuit = tree_sum_circuit(FR, 5, op=ADD)
    inputs = [(i * 17 + 3) % 97 for i in range(32)]
    proof = sparse.prove(circuit, inputs)
    assert proof.circuit_output[0] == sum(inputs)
    assert sparse.verify(circuit, proof, inputs)
    bad = list(inputs)
    bad[7] += 1
    assert not sparse.verify(circuit, proof, bad)


def test_sparse_succinct_matches_dense():
    """Sparse succinct GKR: identical proof bytes to the dense pipeline,
    cross-verifiable both ways, KZG openings included."""
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.gkr import succinct
    from tpu_zk.kzg.trusted_setup import TrustedSetup

    FR = field_ctx("bls12_381_fr")
    circuit = Circuit(FR, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])
    inputs = [2, 3, 4, 5]
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2])
    p_sparse = sparse.prove_succinct(circuit, inputs, setup)
    p_dense = succinct.prove_succinct(circuit, inputs, setup)
    assert p_sparse.claimed_sum == p_dense.claimed_sum
    assert p_sparse.input_polynomial_commitment == p_dense.input_polynomial_commitment
    assert p_sparse.input_rb_proof == p_dense.input_rb_proof
    assert p_sparse.input_rc_proof == p_dense.input_rc_proof
    for a, b in zip(p_sparse.sumcheck_proofs, p_dense.sumcheck_proofs):
        assert a.claimed_sum == b.claimed_sum
        assert a.random_challenges == b.random_challenges
        assert [q.coefficients for q in a.round_univariate_polynomials] == [
            q.coefficients for q in b.round_univariate_polynomials
        ]
    # cross verification: each verifier accepts the other's proof
    assert sparse.verify_succinct(circuit, p_dense, setup)
    assert succinct.verify_succinct(circuit, p_sparse, setup)
    # tampering caught
    p_sparse.wb_evaluations[0] = (p_sparse.wb_evaluations[0] + 1) % FR.p
    assert not sparse.verify_succinct(circuit, p_sparse, setup)
