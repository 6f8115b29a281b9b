"""Multi-device (8-way virtual CPU mesh) sharding tests: NTT + Merkle.

Split from test_parallel.py so xdist's per-file scheduling spreads the
expensive sharded compiles across workers.
"""

import jax
import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.parallel.mesh import make_mesh

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


def test_sharded_fri_matches_single_device():
    """Sharded-commit FRI (fold exchange + sharded Merkle) must produce the
    exact FriProof bytes of the single-device prover."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_zk.fri.fri import FriConfig, prove as prove_single
    from tpu_zk.ntt.ntt import NTT
    from tpu_zk.parallel.sharded_fri import prove as prove_sharded
    from tpu_zk.transcript.fiat_shamir import Transcript

    ctx = field_ctx("bn254_fr")
    k = 10
    cfg = FriConfig("bn254_fr", k, final_size_log2=3, num_queries=5, blowup_log2=2)
    n = 1 << k
    coeffs = np.zeros((n, ctx.L), np.uint32)
    coeffs[: n >> cfg.blowup_log2, 0] = (
        np.arange(n >> cfg.blowup_log2, dtype=np.uint32) % 65521
    )
    codeword = NTT("bn254_fr", k, cfg.root).forward(jnp.asarray(coeffs))

    want = prove_single(cfg, codeword, Transcript())
    mesh = make_mesh(8)
    got = prove_sharded(cfg, codeword, Transcript(), mesh)

    assert got.roots == want.roots
    assert got.final_codeword == want.final_codeword
    for qa, qb in zip(got.queries, want.queries):
        for ra, rb in zip(qa, qb):
            assert (ra.index, ra.value_lo, ra.value_hi) == (rb.index, rb.value_lo, rb.value_hi)
            assert ra.path_lo == rb.path_lo and ra.path_hi == rb.path_hi

    from tpu_zk.fri.fri import verify
    assert verify(cfg, got, Transcript())
