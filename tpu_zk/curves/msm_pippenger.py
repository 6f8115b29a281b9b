"""Pippenger (bucket-method) MSM: signed-digit, window-batched, lane-parallel.

TPU shape analysis: field ops hit compute-bound throughput only on wide
arrays, so the kernel keeps every sequential step maximally wide: all W
windows accumulate simultaneously over a ``[B, L, K]`` VMEM bucket table per
window (one complete EC add across K lanes per chunk step), and the bucket
table never touches HBM (ec_pallas.msm_buckets13_pallas).

Design choices, in decreasing order of win:

* **Radix-2^13 limb domain in-kernel** (fields/rows13.py): the Montgomery
  multiplies that dominate each EC add run with fully lazy uint32
  accumulation -- ~1.5x fewer VPU ops than the storage-format 16-bit CIOS.
  Points are rebased R16 -> R13 once per MSM (one 16-bit multiply by a
  constant + a bit repack); outputs rebase back.
* **Signed base-32 digits**: digits in [-16, 16] need only 16 buckets for
  their magnitudes (negation = one conditional Y negate in-kernel), so a
  255-bit scalar takes 52+1 windows instead of 64 4-bit ones.
* **In-kernel partial reduction**: each window's buckets lane-reduce to 128
  partial sums and fold into the weighted bucket total before leaving VMEM,
  so the XLA tail is just a 128-lane tree reduce + the window combine
  (the full-table XLA reduction it replaces took minutes to compile).

Work: ~53*N + 53*(16 + 2*16*128) EC adds with N/K sequential steps.

Group associativity + final affine normalization keep results bit-identical
to the sequential reference MSM (``multilinear_kzg.rs:37-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith, rows13
from ..fields.arith import FieldCtx
from ..fields.rows13 import Ctx13
from .ec_device import Point, ec_add, ec_identity

WINDOW_BITS = 5  # signed base-32 digits


def _digits(scalar_limbs: jnp.ndarray, c: int) -> jnp.ndarray:
    """[N, L] 16-bit limbs -> [N, W] unsigned c-bit digits (LSB window first)."""
    if c == 16:
        return scalar_limbs
    parts = [(scalar_limbs >> np.uint32(s)) & np.uint32((1 << c) - 1) for s in range(0, 16, c)]
    return jnp.stack(parts, axis=-1).reshape(scalar_limbs.shape[0], -1)


def signed_digit_codes(scalar_limbs: jnp.ndarray) -> jnp.ndarray:
    """[N, Lr] plain 16-bit limbs -> [N, D] packed signed base-32 digits.

    Each code packs ``(|d|-1) | sign << 5 | skip << 6`` for digits
    d in [-16, 16] with sum_i d_i * 32^i == scalar; skip marks d == 0.
    D = ceil(16*Lr / 5) + 1 (one extra window for the final carry).
    """
    n, lr = scalar_limbs.shape
    nbits = 16 * lr
    d_count = -(-nbits // WINDOW_BITS)
    # raw base-32 digits, crossing limb boundaries
    raw = []
    for i in range(d_count):
        lo = WINDOW_BITS * i
        j, r = divmod(lo, 16)
        v = scalar_limbs[:, j] >> np.uint32(r)
        if r > 16 - WINDOW_BITS and j + 1 < lr:
            v = v | (scalar_limbs[:, j + 1] << np.uint32(16 - r))
        raw.append(v & np.uint32(31))
    # carry-convert to signed digits in [-16, 16]
    carry = jnp.zeros((n,), jnp.uint32)
    codes = []
    for i in range(d_count):
        v = raw[i] + carry  # in [0, 32]
        neg = v > np.uint32(16)
        mag = jnp.where(neg, np.uint32(32) - v, v)  # |d| in [0, 16]
        skip = (mag == 0).astype(jnp.uint32)
        idx = jnp.maximum(mag, np.uint32(1)) - np.uint32(1)
        codes.append(idx | (neg.astype(jnp.uint32) << 5) | (skip << 6))
        carry = neg.astype(jnp.uint32)
    # final carry window: digit in {0, 1}
    codes.append(jnp.where(carry == 1, np.uint32(0), np.uint32(64)) * jnp.ones((n,), jnp.uint32))
    return jnp.stack(codes, axis=-1)


def _rebase_points(ctx: FieldCtx, ctx13: Ctx13, points, to13: bool):
    """Montgomery-R16 16-bit limbs <-> Montgomery-R13 13-bit limbs."""
    stacked = jnp.stack(points)  # [3, ..., L]
    if to13:
        const = ctx.array([ctx13.rebase_to13], mont=False)[0]
        return tuple(rows13.repack16to13(ctx13, arith.mont_mul(ctx, stacked, const)))
    const = ctx.array([ctx13.rebase_to16], mont=False)[0]
    return tuple(arith.mont_mul(ctx, rows13.repack13to16(ctx13, stacked), const))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_pippenger(
    ctx: FieldCtx, b3: jnp.ndarray, inputs, c: int = WINDOW_BITS, lanes: int | None = None
) -> Point:
    """inputs = (points ([N,L],)*3, scalar_limbs_plain [N,Lr]) -> single point."""
    points, scalar_limbs = inputs
    N = points[0].shape[0]
    # Small problems (and the CPU test backend) don't amortize the Pippenger
    # machinery: batched double-and-add is one small fori_loop program and
    # produces the identical group element.
    if jax.default_backend() != "tpu" or N < 2048:
        from .ec_device import msm

        shifts = jnp.arange(16, dtype=jnp.uint32)
        bits = ((scalar_limbs[..., None] >> shifts) & np.uint32(1)).reshape(N, -1)
        return msm(ctx, b3, points, bits)

    K = lanes or 512
    modulus = 8 * K  # digit blocks are 8 chunk-steps tall
    if N % modulus:
        pad = modulus - N % modulus
        points = tuple(
            jnp.concatenate([coord, jnp.broadcast_to(i, (pad,) + i.shape)])
            for coord, i in zip(points, ec_identity(ctx))
        )
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((pad, scalar_limbs.shape[1]), jnp.uint32)]
        )
        N += pad

    ctx13 = Ctx13(ctx.name)
    chunk = N // K

    from .ec_pallas import KOUT, msm_buckets13_pallas

    pts13 = _rebase_points(ctx, ctx13, points, to13=True)
    pts13 = tuple(coord.reshape(chunk, K, ctx13.L) for coord in pts13)
    codes = signed_digit_codes(scalar_limbs)  # [N, W]
    W = codes.shape[1]
    codes = codes.reshape(chunk, K, W).transpose(2, 0, 1)  # [W, chunk, K]
    b3_13 = rows13.repack16to13(
        ctx13, arith.mont_mul(ctx, b3, ctx.array([ctx13.rebase_to13], mont=False)[0])
    )

    wins13 = msm_buckets13_pallas(ctx13, b3_13, pts13, codes)  # ([W, KOUT, L13],)*3
    wX, wY, wZ = _rebase_points(ctx, ctx13, wins13, to13=False)  # [W, KOUT, L]

    # reduce the KOUT in-kernel partial sums per window: log-depth pairwise adds
    while wX.shape[1] > 1:
        half = wX.shape[1] // 2
        wX, wY, wZ = ec_add(
            ctx, b3,
            (wX[:, :half], wY[:, :half], wZ[:, :half]),
            (wX[:, half:], wY[:, half:], wZ[:, half:]),
        )
    X, Y, Z = wX[:, 0], wY[:, 0], wZ[:, 0]  # [W]

    # combine windows: log-depth scaled tree, each level pairs (even, odd)
    # windows as even + 2^c * odd, so only c doublings + 1 add per level
    c = WINDOW_BITS
    while X.shape[0] > 1:
        n = X.shape[0]
        if n % 2:
            ident = ec_identity(ctx, (1,))
            X = jnp.concatenate([X, ident[0]])
            Y = jnp.concatenate([Y, ident[1]])
            Z = jnp.concatenate([Z, ident[2]])
        hi = (X[1::2], Y[1::2], Z[1::2])
        hi = jax.lax.fori_loop(0, c, lambda _, h: ec_add(ctx, b3, h, h), hi)
        X, Y, Z = ec_add(ctx, b3, (X[0::2], Y[0::2], Z[0::2]), hi)
        c *= 2
    return (X[0], Y[0], Z[0])
