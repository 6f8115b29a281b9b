"""Fixed-base batched scalar multiplication (windowed table method).

The trusted setup maps every Lagrange-basis scalar onto the SAME base point G
(``multilinear_kzg/src/trusted_setup.rs:51-62`` does it with a per-point
double-and-add loop).  When the base is shared, the doubling chain can be
hoisted entirely off the hot path: the host precomputes the tiny table
``T[w][m] = m * 16^w * G`` (W windows x 16 multiples, ~1k host EC ops), and
the device then needs only one gather + one wide complete add per window --
W ~= 64 adds across all N points instead of ~2*255 per double-and-add bit.
~8x fewer EC ops than ``batch_scalar_mul`` for setup-sized N.

Results are bit-identical group elements (same multiset of additions modulo
group associativity; affine normalization canonicalizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from .ec_device import DeviceCurve, Point, ec_add, ec_identity, ec_select

WINDOW_BITS = 4


def host_window_table(dc: DeviceCurve, num_bits: int) -> Point:
    """([W, 16, L],)*3 device table of m * 16^w * G (m=0 is the identity)."""
    hc = dc.host
    W = -(-num_bits // WINDOW_BITS)
    base = hc.g1_generator()
    rows = []
    for _ in range(W):
        row = [None]
        acc = base
        for _ in range(1, 1 << WINDOW_BITS):
            row.append(hc.g1_affine(acc))
            acc = hc.g1_add(acc, base)
        rows.append(row)
        for _ in range(WINDOW_BITS):
            base = hc.g1_add(base, base)
    flat = [pt for row in rows for pt in row]
    P = dc.points_to_device(flat)
    return tuple(c.reshape(W, 1 << WINDOW_BITS, -1) for c in P)


@functools.partial(jax.jit, static_argnums=(0,))
def fixed_base_msm(ctx: FieldCtx, b3: jnp.ndarray, table: Point, digits: jnp.ndarray) -> Point:
    """scalar[i] * G for all i.  table: ([W,16,L],)*3; digits: [N, W] 4-bit
    windows LSB-first -> ([N,L],)*3 projective points."""
    N, W = digits.shape

    def body(w, acc):
        d = jax.lax.dynamic_index_in_dim(digits, w, axis=1, keepdims=False)
        row = tuple(
            jax.lax.dynamic_index_in_dim(t, w, axis=0, keepdims=False) for t in table
        )
        P = tuple(jnp.take(t, d, axis=0) for t in row)
        return ec_add(ctx, b3, acc, P)

    return jax.lax.fori_loop(0, W, body, ec_identity(ctx, (N,)))


def digits4(scalar_limbs_plain: jnp.ndarray) -> jnp.ndarray:
    """[N, Lr] plain 16-bit limbs -> [N, 4*Lr] 4-bit digits, LSB first."""
    parts = [
        (scalar_limbs_plain >> np.uint32(s)) & np.uint32(15) for s in (0, 4, 8, 12)
    ]
    return jnp.stack(parts, axis=-1).reshape(scalar_limbs_plain.shape[0], -1)
