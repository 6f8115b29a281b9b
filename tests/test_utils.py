"""Serialization, checkpoint/resume, counters, Pippenger MSM."""

from tpu_zk.curves.ec_device import DeviceCurve
from tpu_zk.curves.msm_pippenger import msm_pippenger
from tpu_zk.fields.arith import field_ctx
from tpu_zk.poly.multilinear import MultilinearPolynomial
from tpu_zk.sumcheck import basic
from tpu_zk.utils import counters, serialize
from tpu_zk.utils.checkpoint import CheckpointableSumcheckProver

FQ = field_ctx("bn254_fq")


def test_sumcheck_proof_roundtrip_json():
    proof = basic.Prover.init(FQ, [0, 0, 3, 8]).prove()
    blob = serialize.sumcheck_proof_to_json(proof)
    back = serialize.sumcheck_proof_from_json(blob)
    assert back.initial_claimed_sum == proof.initial_claimed_sum
    assert back.initial_polynomial.to_ints() == proof.initial_polynomial.to_ints()
    assert basic.Verifier.init().verify(back)


def test_gkr_proof_roundtrip_json():
    from tpu_zk.circuit.layered import Circuit, Gate, Layer
    from tpu_zk.gkr import protocol

    circuit = Circuit(FQ, [
        Layer([Gate.mul(0, 1, 0)]),
        Layer([Gate.add(0, 1, 0), Gate.mul(2, 3, 1)]),
    ])
    proof = protocol.prove(circuit, [2, 3, 4, 5])
    back = serialize.gkr_proof_from_json(serialize.gkr_proof_to_json(proof, FQ.name))
    assert protocol.verify(circuit, back, [2, 3, 4, 5])


def test_checkpoint_resume_bit_identical():
    vals = [(i * 7 + 1) % 101 for i in range(64)]
    poly = MultilinearPolynomial.from_ints(FQ, vals)

    reference_proof = basic.Prover(poly).prove()

    prover = CheckpointableSumcheckProver(MultilinearPolynomial.from_ints(FQ, vals))
    assert prover.run(max_rounds=3) is None  # paused mid-proof
    blob = prover.save()

    resumed = CheckpointableSumcheckProver.load(blob)
    proof = resumed.run()
    assert proof is not None
    assert proof.initial_claimed_sum == reference_proof.initial_claimed_sum
    for a, b in zip(
        proof.round_univariate_polynomials,
        reference_proof.round_univariate_polynomials,
    ):
        assert a.to_ints() == b.to_ints()
    assert basic.Verifier.init().verify(proof)


def test_counters_bump_mul():
    counters.enable(True)
    counters.reset()
    ctx = FQ
    import jax

    from tpu_zk.fields import arith

    a = ctx.array([1, 2, 3, 4])
    jax.clear_caches()  # force a retrace so trace-time bumps fire
    arith.mont_mul(ctx, a, a)
    s = counters.summary()
    counters.enable(False)
    assert s.get("bn254_fq", {}).get("mul", 0) >= 4


def test_counters_match_field_tracker_basic_sumcheck():
    """Cross-check op counts against the reference's field-tracker numbers.

    The reference instruments the basic sumcheck with field-tracker
    (``sumcheck_protocol/src/basic_sumcheck/protocol.rs:42-55``); its prover
    over a 2^n table performs analytically (``prover.rs:35-89``):
      mul: 2^n - 1   (partial_evaluate lerp, n rounds of halving tables)
      sub: 2^n - 1   (same lerp)
      add: 2^{n+2} - 2n - 4  (init sum + per-round half sums + lerp adds)

    Vectorization accounting for our pipeline (exact, not fuzzy):
      mul: +2 -- the device Montgomery demotion of the first round univariate
           counts 2 (round0_univariate); the reference has no Montgomery form.
      sub: -1 -- we skip the final fold of the 2-entry table (its result is
           dead; the reference folds it anyway).  Same -1 applies to mul,
           net mul offset = +2 - 1 + 1 (demotion of init claim) = +2.
      add: +2n -- each of the n+1 vectorized sum-reductions counts N elements
           where the reference counts N-1 or N-2 scalar adds.
    """
    import jax

    ctx = field_ctx("bn254_fr")
    for n in (6, 8):
        poly = MultilinearPolynomial.from_ints(ctx, [(i * 7 + 3) % 97 for i in range(1 << n)])
        counters.enable(True)
        counters.reset()
        jax.clear_caches()
        basic.Prover(poly).prove(fused=False)
        s = counters.summary()["bn254_fr"]
        counters.enable(False)
        ref_mul = (1 << n) - 1
        ref_sub = (1 << n) - 1
        ref_add = (1 << (n + 2)) - 2 * n - 4
        assert s["mul"] == ref_mul + 2, (n, s, ref_mul)
        assert s["sub"] == ref_sub - 1, (n, s, ref_sub)
        assert s["add"] == ref_add + 2 * n, (n, s, ref_add)


def test_msm_pippenger_matches_host():
    dc = DeviceCurve("bn254")
    hc = dc.host
    g = hc.g1_generator()
    ks = list(range(1, 13))  # non-power-of-two N exercises padding
    pts = [hc.g1_affine(hc.g1_mul(g, k)) for k in ks]
    scalars = [(k * 7919 + 13) for k in ks]
    limbs = dc.fr.array([s % dc.fr.p for s in scalars], mont=False)
    P = dc.points_to_device(pts)
    # c=4 (the production default): the c=8 variant's 256-bucket suffix scan
    # makes XLA's CPU compile big enough to crash the shared pytest process
    out = msm_pippenger(dc.ctx, dc.b3, (P, limbs), 4)
    expected = hc.g1_affine(hc.g1_mul(g, sum(k * s for k, s in zip(ks, scalars))))
    assert dc.point_to_host(out) == expected


def test_msm_digit_extraction_windows():
    import numpy as np

    from tpu_zk.curves.msm_pippenger import _digits

    dc = DeviceCurve("bn254")
    s = 0xDEADBEEF12345678
    limbs = dc.fr.array([s], mont=False)
    for c in (4, 8, 16):
        d = np.asarray(_digits(limbs, c))[0]
        rebuilt = sum(int(v) << (c * i) for i, v in enumerate(d))
        assert rebuilt == s


def test_sparse_gkr_checkpoint_resume_bit_identical():
    from tpu_zk.circuit.layered import ADD, tree_sum_circuit
    from tpu_zk.gkr import sparse
    from tpu_zk.utils.checkpoint import CheckpointableSparseGkrProver

    ctx = field_ctx("bls12_381_fr")
    circuit = tree_sum_circuit(ctx, 4, op=ADD)
    inputs = [(i * 13 + 5) % 89 for i in range(16)]

    reference_proof = sparse.prove(circuit, inputs)

    prover = CheckpointableSparseGkrProver(circuit, inputs)
    assert prover.run(max_layers=2) is None  # paused mid-proof
    blob = prover.save()

    resumed = CheckpointableSparseGkrProver.load(circuit, blob)
    proof = resumed.run()
    assert proof is not None
    assert proof.claimed_sum == reference_proof.claimed_sum
    assert proof.wb_evaluations == reference_proof.wb_evaluations
    assert proof.wc_evaluations == reference_proof.wc_evaluations
    for a, b in zip(proof.sumcheck_proofs, reference_proof.sumcheck_proofs):
        assert a.claimed_sum == b.claimed_sum
        assert a.random_challenges == b.random_challenges
        assert [q.coefficients for q in a.round_univariate_polynomials] == [
            q.coefficients for q in b.round_univariate_polynomials
        ]
    assert sparse.verify(circuit, proof, inputs)
