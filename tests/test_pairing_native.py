"""Native C++ pairing engine vs the pure-Python tower oracle."""

import pytest

from tpu_zk.curves.host_ec import HostCurve, ec_neg
from tpu_zk.curves.pairing import pairing_product_is_one as py_check
from tpu_zk.curves.pairing_native import _load_lib
from tpu_zk.curves.pairing_native import pairing_product_is_one as native_check


@pytest.mark.parametrize("curve", ["bn254", "bls12_381"])
def test_bilinearity_product(curve):
    hc = HostCurve(curve)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    a, b = 7, 11
    pairs = [
        (hc.g1_affine(hc.g1_mul(g1, a)), hc.g2_affine(hc.g2_mul(g2, b))),
        (hc.g1_affine(ec_neg(hc.g1_mul(g1, a * b))), hc.g2_affine(g2)),
    ]
    assert native_check(curve, pairs)
    assert py_check(curve, pairs)


@pytest.mark.parametrize("curve", ["bn254", "bls12_381"])
def test_tampered_product_rejected(curve):
    hc = HostCurve(curve)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    pairs = [
        (hc.g1_affine(hc.g1_mul(g1, 3)), hc.g2_affine(hc.g2_mul(g2, 5))),
        (hc.g1_affine(ec_neg(hc.g1_mul(g1, 14))), hc.g2_affine(g2)),
    ]
    assert not native_check(curve, pairs)
    assert not py_check(curve, pairs)


@pytest.mark.parametrize("curve", ["bn254", "bls12_381"])
def test_infinity_pairs_skipped(curve):
    hc = HostCurve(curve)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    pairs = [
        (None, hc.g2_affine(g2)),
        (hc.g1_affine(g1), None),
        (hc.g1_affine(hc.g1_mul(g1, 2)), hc.g2_affine(hc.g2_mul(g2, 9))),
        (hc.g1_affine(ec_neg(hc.g1_mul(g1, 18))), hc.g2_affine(g2)),
    ]
    assert native_check(curve, pairs)


def test_native_lib_loads():
    """The build environment ships g++; the engine must actually be native
    here (the py fallback exists for exotic hosts, not this one)."""
    assert _load_lib() is not None
