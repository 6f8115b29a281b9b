"""Limb-major field arithmetic in radix 2^13 for VPU-bound Pallas kernels.

Why a second radix: the framework's storage format is 16-bit limbs (L16
rows), where every 16x16 product nearly fills a uint32 and must be split
into lo/hi halves immediately -- the splits and padded accumulator adds are
~4x the multiply count.  In radix 2^13 a product is < 2^26, so one CIOS pass
can accumulate BOTH the a_i*b and m*p products of all 30 iterations into a
single lazy uint32 accumulator row with no masking at all:

    per row:  30 iterations x 2 products x (2^13-1)^2  =  4.026e9  <  2^32-1

Carry extraction happens once per iteration on row 0 only (the limb being
retired), and one full propagation at the end.  Net ~1.5x fewer VPU ops per
Montgomery multiply than the 16-bit CIOS, which is the entire cost of the
MSM bucket kernel (SURVEY.md section 7 hard-part #1).

The 2^13 domain is private to kernels: callers repack 16-bit Montgomery-R16
arrays to 13-bit Montgomery-R13 on entry and back on exit (helpers below;
the Montgomery rebase itself is one ordinary 16-bit multiply by a constant,
done by the caller).

All helpers operate on limb-major ``[L13, ...]`` uint32 rows like their
16-bit counterparts in ``pallas_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .arith import FieldCtx, field_ctx

BITS13 = 13
M13 = np.uint32((1 << 13) - 1)
L13_OF_BITS = lambda bits: -(-bits // 13)


def limbs13_of_int(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (13 * i)) & 0x1FFF for i in range(n)], dtype=np.uint32)


@functools.lru_cache(maxsize=None)
class Ctx13:
    """Radix-2^13 parameters of a prime field (keyed by field name)."""

    def __init__(self, name: str):
        base = field_ctx(name)
        self.name = name
        self.p = base.p
        self.L16 = base.L
        self.L = L13_OF_BITS(base.p.bit_length() + 1)
        self.R = pow(2, 13 * self.L, self.p)
        self.Rinv = pow(self.R, self.p - 2, self.p)
        self.n0inv = (-pow(self.p, -1, 1 << 13)) % (1 << 13)
        self.p_limbs = limbs13_of_int(self.p, self.L)
        # conversion constants (16-bit-domain Montgomery multiplies):
        #   to13:  mont16(x*R16, R13)        = x*R13
        #   to16:  mont16(x*R13, R16^2/R13)  = x*R16
        self.rebase_to13 = self.R % self.p
        self.rebase_to16 = base.R * base.R % self.p * pow(self.R, self.p - 2, self.p) % self.p

    def consts(self) -> np.ndarray:
        """Kernel constant rows [4, L+1]: p, B^(L+1)-p, B^L-p, R mod p."""
        L = self.L
        out = np.zeros((4, L + 1), np.uint32)
        out[0, :L] = self.p_limbs
        out[1] = limbs13_of_int((1 << (13 * (L + 1))) - self.p, L + 1)
        out[2, :L] = limbs13_of_int((1 << (13 * L)) - self.p, L)
        out[3, :L] = limbs13_of_int(self.R % self.p, L)
        return out


# -- 16 <-> 13 bit repacking (pure jnp; runs in XLA outside the kernel) -----


def repack16to13(ctx13: Ctx13, a16: jnp.ndarray) -> jnp.ndarray:
    """[..., L16] 16-bit limbs -> [..., L13] 13-bit limbs (same integer)."""
    l16 = ctx13.L16
    parts = []
    for i in range(ctx13.L):
        lo_bit = 13 * i
        j, r = lo_bit // 16, lo_bit % 16
        v = a16[..., j] >> np.uint32(r)
        if r > 3 and j + 1 < l16:  # limb spans into the next 16-bit word
            v = v | (a16[..., j + 1] << np.uint32(16 - r))
        parts.append(v & M13)
    return jnp.stack(parts, axis=-1)


def repack13to16(ctx13: Ctx13, a13: jnp.ndarray) -> jnp.ndarray:
    """[..., L13] 13-bit limbs -> [..., L16] 16-bit limbs (same integer)."""
    M16 = np.uint32(0xFFFF)
    parts = []
    for i in range(ctx13.L16):
        lo_bit = 16 * i
        j, r = lo_bit // 13, lo_bit % 13
        v = a13[..., j] >> np.uint32(r)
        if j + 1 < ctx13.L:
            v = v | (a13[..., j + 1] << np.uint32(13 - r))
        if j + 2 < ctx13.L and 13 - r + 13 < 16:  # 16-bit window spans 3 limbs
            v = v | (a13[..., j + 2] << np.uint32(26 - r))
        parts.append(v & M16)
    return jnp.stack(parts, axis=-1)


# -- limb-major kernel primitives (mirror pallas_kernels.py in radix 13) ----


def _shift_up(x: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    return jnp.concatenate([jnp.zeros((k, *x.shape[1:]), jnp.uint32), x[:-k]], 0)


def propagate13(t: jnp.ndarray, out_rows: int) -> jnp.ndarray:
    """Lazy uint32 rows (any magnitude) -> strict 13-bit rows, base 2^13."""
    W = t.shape[0]
    if out_rows > W:
        t = jnp.concatenate([t, jnp.zeros((out_rows - W, *t.shape[1:]), jnp.uint32)], 0)
    for _ in range(2):
        t = (t & M13) + _shift_up(t >> np.uint32(13))
    g = t >> np.uint32(13)  # in {0, 1} after two passes
    r = t & M13
    p = (r == M13).astype(jnp.uint32)
    d = 1
    while d < out_rows:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (r + _shift_up(g, 1)) & M13


def _col13(consts: jnp.ndarray, row: int, width: int, ndim: int) -> jnp.ndarray:
    if consts.ndim == 3:
        c2 = consts[row, :width]
        if ndim <= 2:
            return c2
        return jax.lax.broadcast_in_dim(c2, (width,) + (1,) * (ndim - 1), (0, 1))
    assert ndim <= 2
    return consts[row, :width][:, None]


def cond_sub13(t: jnp.ndarray, consts: jnp.ndarray, row: int, L: int) -> jnp.ndarray:
    """Subtract p when value >= p; t strict [W, ...]; consts row = B^W - p."""
    W = t.shape[0]
    d = propagate13(t + _col13(consts, row, W, t.ndim), W + 1)
    ge = d[W] != 0
    return jnp.where(ge[None], d[:W], t)[:L]


def mont_mul13(ctx13: Ctx13, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """CIOS in radix 2^13 with fully lazy accumulation.

    at, bt: strict 13-bit [L, ...] rows; returns strict canonical [L, ...].
    Product accumulator rows stay below 30*2*(2^13-1)^2 + carries < 2^32.
    """
    L = ctx13.L
    rest = jnp.broadcast_shapes(at.shape[1:], bt.shape[1:])
    ndim = len(rest) + 1
    n = _col13(consts, 0, L, ndim)
    n0inv = np.uint32(ctx13.n0inv)
    zero_row = jnp.zeros((1, *rest), jnp.uint32)
    t = jnp.zeros((L + 1, *rest), jnp.uint32)
    for i in range(L):
        t = t + jnp.concatenate([at[i : i + 1] * bt, zero_row], 0)
        m = ((t[0:1] & M13) * n0inv) & M13
        t = t + jnp.concatenate([m * n, zero_row], 0)
        carry = t[0:1] >> np.uint32(13)
        t = jnp.concatenate([t[1:2] + carry, t[2:], zero_row], 0)
    strict = propagate13(t, L + 1)
    return cond_sub13(strict, consts, 1, L)


def add13(ctx13: Ctx13, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    strict = propagate13(at + bt, ctx13.L + 1)
    return cond_sub13(strict, consts, 1, ctx13.L)


def sub13(ctx13: Ctx13, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """a - b mod p on strict rows: compute a + (p - b) via mask complement."""
    L = ctx13.L
    t = at + (M13 - bt) + _col13(consts, 0, L, max(at.ndim, bt.ndim))
    t = jnp.concatenate([t[:1] + 1, t[1:]], 0)
    strict = propagate13(t, L + 1)[:L]
    return cond_sub13(strict, consts, 2, L)
