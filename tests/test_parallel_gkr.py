"""Multi-device (8-way virtual CPU mesh) sharding tests: sparse GKR.

Split from test_parallel.py so xdist's per-file scheduling spreads the
expensive sharded compiles across workers.
"""

import jax
import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.parallel.mesh import make_mesh

def test_sharded_sparse_gkr_matches_fused():
    """Gates + working set sharded over 8 devices: proof bytes must equal the
    single-device fused prover's (and hence the reference pipeline's)."""
    from tpu_zk.circuit.layered import ADD, MUL, tree_sum_circuit
    from tpu_zk.gkr import fused_sparse, sparse
    from tpu_zk.parallel import sharded_gkr

    fr = field_ctx("bls12_381_fr")
    mesh = make_mesh(8)

    circuit = tree_sum_circuit(fr, 5, op=ADD)
    inputs = [(i * 13 + 5) % 89 for i in range(32)]
    ps = sharded_gkr.prove(circuit, inputs, mesh)
    pf = fused_sparse.prove(circuit, inputs)
    assert ps.claimed_sum == pf.claimed_sum
    assert ps.wb_evaluations == pf.wb_evaluations
    assert ps.wc_evaluations == pf.wc_evaluations
    for pa, pb in zip(ps.sumcheck_proofs, pf.sumcheck_proofs):
        assert pa.claimed_sum == pb.claimed_sum
        assert pa.random_challenges == pb.random_challenges
        assert [q.coefficients for q in pa.round_univariate_polynomials] == [
            q.coefficients for q in pb.round_univariate_polynomials
        ]
    assert sparse.verify(circuit, ps, inputs)


def test_sharded_sparse_gkr_mul_tree():
    from tpu_zk.circuit.layered import MUL, tree_sum_circuit
    from tpu_zk.gkr import fused_sparse, sparse
    from tpu_zk.parallel import sharded_gkr

    fr = field_ctx("bls12_381_fr")
    mesh = make_mesh(8)
    circuit = tree_sum_circuit(fr, 5, op=MUL)
    inputs = [(i % 7) + 2 for i in range(32)]
    ps = sharded_gkr.prove(circuit, inputs, mesh)
    pf = fused_sparse.prove(circuit, inputs)
    for pa, pb in zip(ps.sumcheck_proofs, pf.sumcheck_proofs):
        assert pa.random_challenges == pb.random_challenges
    assert sparse.verify(circuit, ps, inputs)


