"""Multi-device (8-way virtual CPU mesh) sharding tests.

The critical contract: sharded execution produces **bit-identical** proofs
and transcripts to the single-device path (and hence to the Rust reference).
"""

import jax
import pytest

from tpu_zk.curves.ec_device import DeviceCurve
from tpu_zk.fields.arith import field_ctx
from tpu_zk.parallel.mesh import make_mesh
from tpu_zk.parallel.sharded_msm import sharded_msm
from tpu_zk.parallel.sharded_sumcheck import ShardedProver
from tpu_zk.poly.multilinear import MultilinearPolynomial
from tpu_zk.sumcheck import basic

FQ = field_ctx("bn254_fq")


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_sumcheck_matches_unsharded():
    vals = [(i * 13 + 5) % 257 for i in range(1 << 7)]
    poly = MultilinearPolynomial.from_ints(FQ, vals)

    plain_proof = basic.Prover(poly).prove()

    mesh = make_mesh(8)
    sharded_proof = ShardedProver(MultilinearPolynomial.from_ints(FQ, vals), mesh).prove()

    assert sharded_proof.initial_claimed_sum == plain_proof.initial_claimed_sum
    for a, b in zip(
        sharded_proof.round_univariate_polynomials,
        plain_proof.round_univariate_polynomials,
    ):
        assert a.to_ints() == b.to_ints()
    assert basic.Verifier.init().verify(sharded_proof)


def test_sharded_sumcheck_small_table():
    # N == 2*D boundary: first round is already the gather path
    vals = list(range(16))
    mesh = make_mesh(8)
    proof = ShardedProver(MultilinearPolynomial.from_ints(FQ, vals), mesh).prove()
    assert basic.Verifier.init().verify(proof)


def test_sharded_msm_matches_host():
    dc = DeviceCurve("bn254")
    hc = dc.host
    g = hc.g1_generator()
    ks = list(range(1, 17))
    points = [hc.g1_affine(hc.g1_mul(g, k)) for k in ks]
    scalars = [(7 * k + 3) for k in ks]
    mesh = make_mesh(8)
    got = sharded_msm(dc, mesh, points, scalars)
    expected_k = sum(k * s for k, s in zip(ks, scalars))
    assert got == hc.g1_affine(hc.g1_mul(g, expected_k))


def test_sharded_sparse_gkr_matches_fused():
    """Gates + working set sharded over 8 devices: proof bytes must equal the
    single-device fused prover's (and hence the reference pipeline's)."""
    from tpu_zk.circuit.layered import ADD, MUL, tree_sum_circuit
    from tpu_zk.gkr import fused_sparse, sparse
    from tpu_zk.parallel import sharded_gkr

    fr = field_ctx("bls12_381_fr")
    mesh = make_mesh(8)

    circuit = tree_sum_circuit(fr, 6, op=ADD)
    inputs = [(i * 13 + 5) % 89 for i in range(64)]
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


def test_sharded_ntt_matches_single_device():
    """Six-step passes sharded over 8 devices, all_to_all at the digit turn:
    must equal the single-device SixStepPlan bit-for-bit."""
    from tpu_zk.ntt.ntt import NTT
    from tpu_zk.ntt.sixstep import SixStepPlan
    from tpu_zk.parallel.sharded_ntt import sharded_sixstep

    ctx = field_ctx("bn254_fr")
    k = 16
    ref = NTT("bn254_fr", k)
    plan = SixStepPlan("bn254_fr", k, ref.root)
    import numpy as np
    import jax.numpy as jnp

    limbs = np.zeros((1 << k, ctx.L), np.uint32)
    limbs[:, 0] = (np.arange(1 << k) * 7919 + 31) % 65521
    table = jnp.asarray(limbs)

    want = np.asarray(plan(table))
    mesh = make_mesh(8)
    got = np.asarray(sharded_sixstep(plan, table, mesh))
    assert (got == want).all()


def test_sharded_ntt_inverse_roundtrip():
    from tpu_zk.ntt.ntt import NTT
    from tpu_zk.ntt.sixstep import SixStepPlan
    from tpu_zk.parallel.sharded_ntt import sharded_sixstep

    ctx = field_ctx("bn254_fr")
    k = 12
    ref = NTT("bn254_fr", k)
    fwd = SixStepPlan("bn254_fr", k, ref.root)
    inv = SixStepPlan("bn254_fr", k, ref.root, inverse=True)
    vals = [(i * 104729 + 7) % ctx.p for i in range(1 << k)]
    mesh = make_mesh(8)
    table = ctx.array(vals)
    back = sharded_sixstep(inv, sharded_sixstep(fwd, table, mesh), mesh)
    assert ctx.to_ints(back) == vals


def test_sharded_merkle_matches_single_device():
    import numpy as np

    from tpu_zk.merkle.device_merkle import merkle_field_tree
    from tpu_zk.parallel.sharded_merkle import sharded_merkle_field_tree

    ctx = field_ctx("bn254_fr")
    table = ctx.array([(i * 31 + 7) % 65521 for i in range(64)])
    mesh = make_mesh(8)
    got = sharded_merkle_field_tree(ctx, table, mesh)
    want = merkle_field_tree(ctx, table)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()
