"""Limb-major fused-GKR round vs the element-major round (bit-identity).

Separate file so xdist's per-file worker grouping keeps this group's XLA:CPU
compile count under the in-process compiler's crash horizon (pytest.ini).
"""
def test_round_lm_matches_round():
    """The limb-major round (_round_lm: MXU fold + lm collapse muls) must be
    bit-identical to _round on the same working set and sponge state."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.gkr.fused_sparse import _round, _round_lm
    from tpu_zk.transcript.device_fs import DeviceSponge
    from tpu_zk.transcript.keccak import Keccak256

    ctx = field_ctx("bn254_fr")
    S = 512
    rng = np.random.default_rng(21)
    vals = [
        (int(a) * int(b) * int(c)) % ctx.p
        for a, b, c in rng.integers(1, 2**62, size=(4 * S, 3))
    ]
    stacked = ctx.array(vals).reshape(2, 2, S, ctx.L)
    sponge = DeviceSponge.from_host(Keccak256())
    state, buf, pos = sponge.state, sponge.buf, jnp.int32(sponge.pos)

    c1, d1, r1, f1, s1, b1, p1 = _round(ctx, stacked, state, buf, pos)
    c2, d2, r2, f2, s2, b2, p2 = _round_lm(
        ctx, stacked.transpose(0, 1, 3, 2), state, buf, pos
    )
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(f1), np.asarray(f2.transpose(0, 1, 3, 2)))
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    # challenge + sponge buffer/position: a divergence here would only
    # corrupt the transcript in *later* rounds, so check it explicitly
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    assert int(p1) == int(p2)
