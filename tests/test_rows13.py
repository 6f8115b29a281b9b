"""Radix-2^13 kernel-domain field arithmetic (fields/rows13.py) vs exact ints."""

import numpy as np
import jax.numpy as jnp

from tpu_zk.fields import rows13
from tpu_zk.fields.arith import field_ctx
from tpu_zk.fields.rows13 import Ctx13


def _to_rows13(ctx13, values):
    """ints -> limb-major [L13, N] strict rows."""
    arr = np.stack([rows13.limbs13_of_int(v, ctx13.L) for v in values])  # [N, L]
    return jnp.asarray(arr.T)


def _rows_to_ints(ctx13, rows):
    a = np.asarray(rows).T  # [N, L]
    return [sum(int(v) << (13 * i) for i, v in enumerate(row)) for row in a]


def test_repack_roundtrip():
    for name in ("bls12_381_fq", "bn254_fq", "bls12_381_fr"):
        ctx = field_ctx(name)
        ctx13 = Ctx13(name)
        rng = np.random.default_rng(7)
        vals = [int(rng.integers(0, 1 << 62)) ** 4 % ctx.p for _ in range(20)] + [0, 1, ctx.p - 1]
        a16 = jnp.asarray(np.stack([ctx.to_limbs(v) for v in vals]))
        a13 = rows13.repack16to13(ctx13, a16)
        # value preserved
        got = [sum(int(x) << (13 * i) for i, x in enumerate(row)) for row in np.asarray(a13)]
        assert got == vals
        back = rows13.repack13to16(ctx13, a13)
        assert np.array_equal(np.asarray(back), np.asarray(a16))


def test_mont_mul13_matches_ints():
    name = "bls12_381_fq"
    ctx13 = Ctx13(name)
    p, R = ctx13.p, ctx13.R
    rng = np.random.default_rng(13)
    xs = [int.from_bytes(rng.bytes(48), "big") % p for _ in range(16)]
    ys = [int.from_bytes(rng.bytes(48), "big") % p for _ in range(16)]
    # worst-case lazy accumulation: all limbs maximal
    xs += [p - 1, (1 << 377) - 1]
    ys += [p - 1, (1 << 377) - 1]
    at = _to_rows13(ctx13, [x * R % p for x in xs])
    bt = _to_rows13(ctx13, [y * R % p for y in ys])
    consts = jnp.asarray(ctx13.consts())
    out = rows13.mont_mul13(ctx13, at, bt, consts)
    got = _rows_to_ints(ctx13, out)
    want = [x * y % p * R % p for x, y in zip(xs, ys)]
    assert got == want


def test_add_sub13_match_ints():
    name = "bn254_fq"
    ctx13 = Ctx13(name)
    p = ctx13.p
    rng = np.random.default_rng(99)
    xs = [int.from_bytes(rng.bytes(32), "big") % p for _ in range(12)] + [0, p - 1]
    ys = [int.from_bytes(rng.bytes(32), "big") % p for _ in range(12)] + [0, p - 1]
    at, bt = _to_rows13(ctx13, xs), _to_rows13(ctx13, ys)
    consts = jnp.asarray(ctx13.consts())
    assert _rows_to_ints(ctx13, rows13.add13(ctx13, at, bt, consts)) == [
        (x + y) % p for x, y in zip(xs, ys)
    ]
    assert _rows_to_ints(ctx13, rows13.sub13(ctx13, at, bt, consts)) == [
        (x - y) % p for x, y in zip(xs, ys)
    ]


def test_signed_digit_codes_reconstruct():
    from tpu_zk.curves.msm_pippenger import signed_digit_codes

    fr = field_ctx("bls12_381_fr")
    rng = np.random.default_rng(5)
    scalars = [int.from_bytes(rng.bytes(32), "big") % fr.p for _ in range(8)] + [0, 1, fr.p - 1]
    limbs = jnp.asarray(np.stack([fr.to_limbs(s) for s in scalars]))
    codes = np.asarray(signed_digit_codes(limbs))
    for s, row in zip(scalars, codes):
        total = 0
        for i, code in enumerate(row):
            skip, sign, idx = (code >> 6) & 1, (code >> 5) & 1, code & 31
            assert idx < 16
            if skip:
                continue
            d = -(int(idx) + 1) if sign else int(idx) + 1
            total += d << (5 * i)
        assert total == s, f"scalar {s} reconstructed as {total}"


def test_ec_add_rows13_matches_host():
    """One complete RCB add in the radix-13 domain vs the host oracle."""
    from tpu_zk.curves.ec_pallas import _ec_add_rows13
    from tpu_zk.curves.host_ec import Fp, HostCurve

    hc = HostCurve("bls12_381")
    ctx13 = Ctx13("bls12_381_fq")
    p, R = ctx13.p, ctx13.R
    G = hc.g1_generator()
    G2 = hc.g1_add(G, G)
    G3 = hc.g1_add(G2, G)
    ident = (Fp(p, 0), Fp(p, 1), Fp(p, 0))
    pts_a = [G, G2, ident, G3]
    pts_b = [G2, G2, G, G3]  # incl. identity operand and equal-point doubling
    to_ints = lambda P: (P[0].v, P[1].v, P[2].v)
    rowsA = [_to_rows13(ctx13, [to_ints(P)[i] * R % p for P in pts_a]) for i in range(3)]
    rowsB = [_to_rows13(ctx13, [to_ints(P)[i] * R % p for P in pts_b]) for i in range(3)]
    consts = jnp.asarray(ctx13.consts())
    b3t = _to_rows13(ctx13, [hc.b3_g1.v * R % p] * len(pts_a))
    X, Y, Z = _ec_add_rows13(ctx13, consts, b3t, rowsA, rowsB)
    got = list(zip(_rows_to_ints(ctx13, X), _rows_to_ints(ctx13, Y), _rows_to_ints(ctx13, Z)))
    Rinv = pow(R, p - 2, p)
    for (x, y, z), a, b in zip(got, pts_a, pts_b):
        want = hc.g1_affine(hc.g1_add(a, b))
        x, y, z = x * Rinv % p, y * Rinv % p, z * Rinv % p
        if want is None:
            assert z == 0
        else:
            zinv = pow(z, p - 2, p)
            assert (x * zinv % p, y * zinv % p) == want
