"""Curve arithmetic: host oracle, device kernels, pairings."""

import pytest

from tpu_zk.curves.ec_device import DeviceCurve, ec_add, msm
from tpu_zk.curves.host_ec import HostCurve
from tpu_zk.curves.pairing import pairing, pairing_product_is_one, tower

CURVE_NAMES = ["bn254", "bls12_381"]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_generators_and_subgroup(name):
    hc = HostCurve(name)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    assert hc.g1_is_on_curve(g1)
    assert hc.g2_is_on_curve(g2)
    assert hc.g1_mul(g1, hc.r)[2].is_zero()
    assert hc.g2_mul(g2, hc.r)[2].is_zero()


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_device_ec_add_matches_host(name):
    dc = DeviceCurve(name)
    hc = dc.host
    g = hc.g1_generator()
    pts_host = [hc.g1_affine(hc.g1_mul(g, k)) for k in [1, 2, 3, 5, 7, 11, 100, 12345]]
    P = dc.points_to_device(pts_host[0::2])
    Q = dc.points_to_device(pts_host[1::2])
    R = ec_add(dc.ctx, dc.b3, P, Q)
    got = dc.points_to_host(R)
    for i, (ka, kb) in enumerate(zip([1, 3, 7, 100], [2, 5, 11, 12345])):
        expected = hc.g1_affine(hc.g1_mul(g, ka + kb))
        assert got[i] == expected


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_device_ec_add_identity_and_double(name):
    dc = DeviceCurve(name)
    hc = dc.host
    g = hc.g1_generator()
    ga = hc.g1_affine(g)
    P = dc.points_to_device([ga, ga, None])
    Q = dc.points_to_device([None, ga, None])
    got = dc.points_to_host(ec_add(dc.ctx, dc.b3, P, Q))
    assert got[0] == ga  # P + 0
    assert got[1] == hc.g1_affine(hc.g1_mul(g, 2))  # doubling through add
    assert got[2] is None  # 0 + 0


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_device_msm_matches_host(name):
    dc = DeviceCurve(name)
    hc = dc.host
    g = hc.g1_generator()
    points = [hc.g1_affine(hc.g1_mul(g, k)) for k in [1, 2, 3, 4]]
    scalars = [5, 0, 7, 11]
    got = dc.msm_ints(points, scalars)
    expected_k = 1 * 5 + 2 * 0 + 3 * 7 + 4 * 11
    assert got == hc.g1_affine(hc.g1_mul(g, expected_k))


def test_msm_all_zero_scalars():
    dc = DeviceCurve("bn254")
    hc = dc.host
    g = hc.g1_generator()
    points = [hc.g1_affine(hc.g1_mul(g, k)) for k in [1, 2]]
    assert dc.msm_ints(points, [0, 0]) is None


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_pairing_bilinearity(name):
    hc = HostCurve(name)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    e = lambda a, b: pairing(name, hc.g1_affine(a), hc.g2_affine(b))
    e0 = e(g1, g2)
    assert e0 != tower(name).one12()
    assert e(hc.g1_mul(g1, 3), g2) == e(g1, hc.g2_mul(g2, 3))
    assert e(hc.g1_mul(g1, 2), hc.g2_mul(g2, 3)) == e0.pow(6)


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_pairing_product(name):
    hc = HostCurve(name)
    g1, g2 = hc.g1_generator(), hc.g2_generator()
    # e(2 g1, g2) * e(-2 g1, g2) == 1
    p1 = hc.g1_affine(hc.g1_mul(g1, 2))
    p2 = hc.g1_affine(hc.g1_mul(g1, hc.r - 2))
    q = hc.g2_affine(g2)
    assert pairing_product_is_one(name, [(p1, q), (p2, q)])
    assert not pairing_product_is_one(name, [(p1, q), (p1, q)])
