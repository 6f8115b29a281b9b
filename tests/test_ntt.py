"""NTT: roundtrip, naive-DFT oracle, convolution theorem."""

import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.ntt.ntt import NTT, find_root_of_unity, polynomial_multiply

FIELDS = ["bn254_fr", "bls12_381_fr"]


@pytest.mark.parametrize("name", FIELDS)
def test_root_of_unity(name):
    ctx = field_ctx(name)
    w = find_root_of_unity(name, 10)
    assert pow(w, 1 << 10, ctx.p) == 1
    assert pow(w, 1 << 9, ctx.p) != 1


@pytest.mark.parametrize("name", FIELDS)
def test_ntt_matches_naive_dft(name):
    ctx = field_ctx(name)
    ntt = NTT(name, 3)
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    got = ntt.forward_ints(vals)
    w = ntt.root
    expected = [
        sum(v * pow(w, i * j, ctx.p) for j, v in enumerate(vals)) % ctx.p
        for i in range(8)
    ]
    assert got == expected


@pytest.mark.parametrize("name", FIELDS)
def test_ntt_roundtrip(name):
    ntt = NTT(name, 6)
    vals = [(i * 31 + 7) % 1009 for i in range(64)]
    assert ntt.inverse_ints(ntt.forward_ints(vals)) == vals


def test_convolution_theorem():
    a = [5, 0, 2]
    b = [6, 2]
    # dense_univariate.rs:233-243 golden: [30, 10, 12, 4]
    assert polynomial_multiply("bn254_fr", a, b) == [30, 10, 12, 4]


@pytest.mark.slow
def test_ntt_large_roundtrip():
    ntt = NTT("bn254_fr", 12)
    vals = [(i * 997 + 123) % 65537 for i in range(1 << 12)]
    assert ntt.inverse_ints(ntt.forward_ints(vals)) == vals
