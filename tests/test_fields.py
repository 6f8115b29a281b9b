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
