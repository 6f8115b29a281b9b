"""Multi-pass (Bailey/six-step) NTT vs the stage-at-a-time reference path.

Runs in Pallas interpret mode on the CPU test backend; the TPU path compiles
the same kernels.  Covers R=1 (single kernel), R=2, and odd/even factor
splits, forward and inverse, plus linearity/convolution sanity.
"""

import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.ntt.ntt import NTT
from tpu_zk.ntt.sixstep import SixStepPlan, _split_logs


@pytest.mark.parametrize("k", [3, 4, 8, 9, 11])
@pytest.mark.parametrize("field", ["bn254_fr"])
def test_sixstep_matches_reference(k, field):
    ctx = field_ctx(field)
    vals = [(i * 7919 + 31) % ctx.p for i in range(1 << k)]
    ref = NTT(field, k)
    want = ref.forward_ints(vals)
    plan = SixStepPlan(field, k, ref.root)
    got = ctx.to_ints(plan(ctx.array(vals)))
    assert got == want


@pytest.mark.parametrize("k", [4, 9, 11])
def test_sixstep_inverse_roundtrip(k):
    ctx = field_ctx("bn254_fr")
    vals = [(i * 104729 + 7) % ctx.p for i in range(1 << k)]
    ref = NTT("bn254_fr", k)
    fwd = SixStepPlan("bn254_fr", k, ref.root)
    inv = SixStepPlan("bn254_fr", k, ref.root, inverse=True)
    assert ctx.to_ints(inv(fwd(ctx.array(vals)))) == vals


def test_sixstep_bls_field():
    ctx = field_ctx("bls12_381_fr")
    k = 9
    vals = [(i * 13 + 2) % ctx.p for i in range(1 << k)]
    ref = NTT("bls12_381_fr", k)
    plan = SixStepPlan("bls12_381_fr", k, ref.root)
    assert ctx.to_ints(plan(ctx.array(vals))) == ref.forward_ints(vals)


def test_split_logs():
    assert _split_logs(8) == [8]
    assert _split_logs(20) == [7, 7, 6]
    assert _split_logs(24) == [8, 8, 8]
    assert sum(_split_logs(17)) == 17
    for k in range(9, 25):
        assert all(3 <= l <= 8 for l in _split_logs(k))


def test_sixstep_mxu_matches_vpu():
    """The MXU digit-matmul plan must equal the butterfly plan bit-for-bit
    (forward and inverse, radix <= 2^5 split vs <= 2^8 split)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.ntt.ntt import NTT
    from tpu_zk.ntt.sixstep import SixStepPlan

    ctx = field_ctx("bn254_fr")
    n_log2 = 10
    ntt = NTT("bn254_fr", n_log2)
    n = 1 << n_log2
    rng = np.random.default_rng(3)
    vals = [(int(a) * int(b)) % ctx.p for a, b in rng.integers(1, 2**60, size=(n, 2))]
    table = ctx.array(vals)

    fwd_vpu = SixStepPlan("bn254_fr", n_log2, ntt.root, use_mxu=False)
    fwd_mxu = SixStepPlan("bn254_fr", n_log2, ntt.root, use_mxu=True)
    a = fwd_vpu(table)
    b = fwd_mxu(table)
    assert np.array_equal(np.asarray(a), np.asarray(b))

    inv_vpu = SixStepPlan("bn254_fr", n_log2, ntt.root, inverse=True, use_mxu=False)
    inv_mxu = SixStepPlan("bn254_fr", n_log2, ntt.root, inverse=True, use_mxu=True)
    ia = inv_vpu(b)
    ib = inv_mxu(b)
    assert np.array_equal(np.asarray(ia), np.asarray(ib))
    assert np.array_equal(np.asarray(ia), np.asarray(table))  # roundtrip
