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
