"""Field arithmetic vs an exact Python-integer model."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_zk.fields import arith
from tpu_zk.fields.arith import field_ctx

FIELDS = ["bn254_fq", "bn254_fr", "bls12_381_fr", "bls12_381_fq"]


def rand_elems(ctx, n, rng):
    return [rng.randrange(ctx.p) for _ in range(n)]


@pytest.mark.parametrize("name", FIELDS)
def test_roundtrip(name, rng):
    ctx = field_ctx(name)
    xs = rand_elems(ctx, 7, rng) + [0, 1, ctx.p - 1]
    arr = ctx.array(xs)
    assert ctx.to_ints(arr) == xs


@pytest.mark.parametrize("name", FIELDS)
def test_add_sub_neg(name, rng):
    ctx = field_ctx(name)
    xs = rand_elems(ctx, 16, rng) + [0, ctx.p - 1]
    ys = rand_elems(ctx, 16, rng) + [ctx.p - 1, ctx.p - 1]
    a, b = ctx.array(xs), ctx.array(ys)
    assert ctx.to_ints(arith.add(ctx, a, b)) == [(x + y) % ctx.p for x, y in zip(xs, ys)]
    assert ctx.to_ints(arith.sub(ctx, a, b)) == [(x - y) % ctx.p for x, y in zip(xs, ys)]
    assert ctx.to_ints(arith.neg(ctx, a)) == [(-x) % ctx.p for x in xs]


@pytest.mark.parametrize("name", FIELDS)
def test_mont_mul(name, rng):
    ctx = field_ctx(name)
    xs = rand_elems(ctx, 32, rng) + [0, 1, ctx.p - 1, ctx.p - 1]
    ys = rand_elems(ctx, 32, rng) + [ctx.p - 1, ctx.p - 1, ctx.p - 1, 1]
    a, b = ctx.array(xs), ctx.array(ys)
    got = ctx.to_ints(arith.mont_mul(ctx, a, b))
    assert got == [x * y % ctx.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("name", ["bn254_fq", "bls12_381_fq"])
def test_to_from_mont_device(name, rng):
    ctx = field_ctx(name)
    xs = rand_elems(ctx, 5, rng)
    plain = ctx.array(xs, mont=False)
    m = arith.to_mont(ctx, plain)
    assert ctx.to_ints(m) == xs  # to_ints assumes Montgomery
    back = arith.from_mont(ctx, m)
    assert ctx.to_ints(back, mont=False) == xs


@pytest.mark.parametrize("name", FIELDS)
@pytest.mark.parametrize("n", [1, 2, 8, 1 << 12, (1 << 15) + 3])
def test_sum_mod(name, n, rng):
    ctx = field_ctx(name)
    xs = [rng.randrange(ctx.p) for _ in range(n)]
    arr = ctx.array(xs)
    got = ctx.to_ints(arith.sum_mod(ctx, arr))
    assert got == sum(xs) % ctx.p


@pytest.mark.parametrize("name", ["bn254_fq"])
def test_pow_and_inv(name, rng):
    ctx = field_ctx(name)
    xs = rand_elems(ctx, 4, rng)
    a = ctx.array(xs)
    assert ctx.to_ints(arith.pow_mont(ctx, a, 5)) == [pow(x, 5, ctx.p) for x in xs]
    inv = arith.inv_mont(ctx, a)
    assert ctx.to_ints(inv) == [pow(x, ctx.p - 2, ctx.p) for x in xs]


def test_broadcast_scalar(rng):
    ctx = field_ctx("bn254_fq")
    xs = rand_elems(ctx, 9, rng)
    s = rng.randrange(ctx.p)
    a = ctx.array(xs)
    got = ctx.to_ints(arith.mont_mul(ctx, a, ctx.scalar(s)))
    assert got == [x * s % ctx.p for x in xs]


def test_eq_iszero():
    ctx = field_ctx("bn254_fr")
    a = ctx.array([0, 5, 0])
    assert arith.is_zero(ctx, a).tolist() == [True, False, True]


# ---------------------------------------------------------------------------
# MXU digit-matmul kernels (fields/mxu_mul.py): bit-identity vs the CIOS path
# (interpret mode on CPU; the compiled path is cross-checked on TPU by the
# same assertions in the bench/verify flows)
# ---------------------------------------------------------------------------


def _rand_mont(ctx, n, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    vals = [
        (int(a) * int(b) * int(c)) % ctx.p
        for a, b, c in rng.integers(1, 2**62, size=(n, 3))
    ]
    return ctx.array(vals)


@pytest.mark.parametrize("name", ["bn254_fr", "bls12_381_fr"])
def test_mxu_mul_const_matches_mont_mul(name):
    import numpy as np

    from tpu_zk.fields import arith
    from tpu_zk.fields.mxu_mul import mul_const_mxu_pallas

    ctx = arith.field_ctx(name)
    a = _rand_mont(ctx, 256, seed=11)
    c = ctx.scalar(987654321987654321 % ctx.p)
    ref = arith.mont_mul(ctx, a, c)
    got = mul_const_mxu_pallas(ctx, a, c, 256)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
    # edge values on both sides
    edge = ctx.array([0, 1, ctx.p - 1, ctx.p - 2] * 64)
    for cv in (0, 1, ctx.p - 1):
        cs = ctx.scalar(cv)
        assert np.array_equal(
            np.asarray(arith.mont_mul(ctx, edge, cs)),
            np.asarray(mul_const_mxu_pallas(ctx, edge, cs, 256)),
        )


def test_mxu_fold_lm_bit_identical():
    import jax.numpy as jnp
    import numpy as np

    from tpu_zk.fields import arith
    from tpu_zk.fields.mxu_mul import fold_mxu_lm
    from tpu_zk.poly.multilinear import fold_and_half_sums

    ctx = arith.field_ctx("bn254_fr")
    n = 1 << 10
    table = _rand_mont(ctx, n, seed=5)
    r = ctx.scalar(123456789123456789 % ctx.p)
    ref_folded, ref_univ = fold_and_half_sums(ctx, table, r)
    folded, wide = fold_mxu_lm(ctx, table.T[None], r, 128)
    assert np.array_equal(np.asarray(folded[0].T), np.asarray(ref_folded))
    G = wide.shape[1]
    lazy = jnp.sum(wide[0].reshape(2, G // 2, ctx.L + 2), axis=1, dtype=jnp.uint32)
    univ = arith.reduce_wide_to_mont(ctx, arith.carry_propagate(lazy, ctx.L + 4))
    assert np.array_equal(np.asarray(univ), np.asarray(ref_univ))
