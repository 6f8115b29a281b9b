"""Fused (pooled-program, async-chained) sparse GKR prover vs ``sparse.prove``.

The fused driver must emit byte-identical proofs: same claimed sums, round
univariate coefficients, challenges, and wb/wc evaluations -- it runs the
same Libra two-phase sumcheck with the Fiat-Shamir sponge resident on device
and a dynamic buffer position.
"""

from tpu_zk.circuit.layered import ADD, MUL, Circuit, Gate, Layer, tree_sum_circuit
from tpu_zk.fields.arith import field_ctx
from tpu_zk.gkr import fused_sparse, sparse

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


def _assert_same_proof(a, b):
    assert a.circuit_output == b.circuit_output
    assert a.claimed_sum == b.claimed_sum
    assert a.wb_evaluations == b.wb_evaluations
    assert a.wc_evaluations == b.wc_evaluations
    for pa, pb in zip(a.sumcheck_proofs, b.sumcheck_proofs):
        assert pa.claimed_sum == pb.claimed_sum
        assert pa.random_challenges == pb.random_challenges
        assert [q.coefficients for q in pa.round_univariate_polynomials] == [
            q.coefficients for q in pb.round_univariate_polynomials
        ]


def test_fused_matches_sparse():
    for circuit, inputs in _circuits():
        _assert_same_proof(fused_sparse.prove(circuit, inputs), sparse.prove(circuit, inputs))


def test_fused_tree_and_verify():
    circuit = tree_sum_circuit(FR, 5, op=ADD)
    inputs = [(i * 13 + 5) % 89 for i in range(32)]
    pf = fused_sparse.prove(circuit, inputs)
    _assert_same_proof(pf, sparse.prove(circuit, inputs))
    assert sparse.verify(circuit, pf, inputs)


def test_fused_mul_tree():
    """MUL gates exercise the M1/M' bookkeeping tables."""
    circuit = tree_sum_circuit(FR, 3, op=MUL)
    inputs = [2, 3, 5, 7, 11, 13, 17, 19]
    pf = fused_sparse.prove(circuit, inputs)
    _assert_same_proof(pf, sparse.prove(circuit, inputs))
    assert sparse.verify(circuit, pf, inputs)


def test_fused_large_layer_path(monkeypatch):
    """Force the unfused (per-phase + _rounds_tail) branch that big layers
    take on TPU: with _FUSE_MAX dropped to 4, layers wider than 4 run
    _phase1/_run_rounds/_phase2 individually and must stay bit-identical."""
    monkeypatch.setattr(fused_sparse, "_FUSE_MAX", 4)
    circuit = tree_sum_circuit(FR, 4, op=ADD)
    inputs = [(i * 7 + 3) % 97 for i in range(16)]
    pf = fused_sparse.prove(circuit, inputs)
    _assert_same_proof(pf, sparse.prove(circuit, inputs))
    assert sparse.verify(circuit, pf, inputs)


def test_fused_succinct_matches_sparse():
    from tpu_zk.kzg.trusted_setup import TrustedSetup

    circuit, inputs = _circuits()[0]
    setup = TrustedSetup.initialize_setup("bls12_381", [5, 2])
    pf = fused_sparse.prove_succinct(circuit, inputs, setup)
    ps = sparse.prove_succinct(circuit, inputs, setup)
    assert pf.claimed_sum == ps.claimed_sum
    assert pf.input_polynomial_commitment == ps.input_polynomial_commitment
    assert pf.input_rb_proof == ps.input_rb_proof
    assert pf.input_rc_proof == ps.input_rc_proof
    for pa, pb in zip(pf.sumcheck_proofs, ps.sumcheck_proofs):
        assert pa.random_challenges == pb.random_challenges
    assert sparse.verify_succinct(circuit, pf, setup)

