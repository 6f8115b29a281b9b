"""Pippenger (bucket-method) MSM: lane-parallel serial accumulation.

Scheme (the "independent serial sub-MSM" layout GPUs use, mapped to TPU
vector lanes): split the N points into K contiguous chunks.  For each c-bit
scalar window, every lane walks its chunk serially (a ``fori_loop`` whose
body is ONE complete EC add across all K lanes) accumulating into a private
``[K, 2^c]`` bucket row via row-unique gather/scatter.  Lanes then tree-
reduce (log2 K wide adds), the weighted bucket sum  sum_b b*S_b  collapses
via a Hillis-Steele suffix scan over the bucket axis, and windows combine
Horner-style (c doublings each) under ``fori_loop``.

Why this shape: every loop body is a single stacked EC add, so the XLA graph
stays ~15 adds total regardless of N -- seconds to compile -- while total
work is W*N + W*K*2^c point-adds, ~13x less than the 512-step double-and-add
kernel at 2^20.  No sorting, no gathers over the point table.

Group associativity + final affine normalization make results bit-identical
to the sequential reference MSM (``multilinear_kzg.rs:37-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.arith import FieldCtx
from .ec_device import Point, ec_add, ec_identity


def _digits(scalar_limbs: jnp.ndarray, c: int) -> jnp.ndarray:
    """[N, L] 16-bit limbs -> [N, W] c-bit digits (LSB window first)."""
    if c == 16:
        return scalar_limbs
    assert c == 8
    lo = scalar_limbs & np.uint32(0xFF)
    hi = scalar_limbs >> np.uint32(8)
    return jnp.stack([lo, hi], axis=-1).reshape(scalar_limbs.shape[0], -1)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_pippenger(ctx: FieldCtx, b3: jnp.ndarray, inputs, c: int = 8, lanes: int | None = None) -> Point:
    """inputs = (points ([N,L],)*3, scalar_limbs_plain [N,Lr]) -> single point."""
    points, scalar_limbs = inputs
    N = points[0].shape[0]
    B = 1 << c
    K = lanes or (1 << (min(1024, N).bit_length() - 1))  # power of two <= min(1024, N)
    if N % K:
        pad = K - N % K
        points = tuple(
            jnp.concatenate([coord, jnp.broadcast_to(i, (pad,) + i.shape)])
            for coord, i in zip(points, ec_identity(ctx))
        )
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((pad, scalar_limbs.shape[1]), jnp.uint32)]
        )
        N += pad

    digits = _digits(scalar_limbs, c)  # [N, W]
    W = digits.shape[1]
    chunk = N // K
    pts = tuple(coord.reshape(K, chunk, ctx.L) for coord in points)
    digs = digits.reshape(K, chunk, W).transpose(2, 0, 1)  # [W, K, chunk]
    rows = jnp.arange(K)

    def window_sum(carry, dig_w):  # dig_w: [K, chunk]
        buckets = ec_identity(ctx, (K, B))

        def step(j, buckets):
            d = jax.lax.dynamic_index_in_dim(dig_w, j, axis=1, keepdims=False)
            P_j = tuple(
                jax.lax.dynamic_index_in_dim(cc, j, axis=1, keepdims=False)
                for cc in pts
            )
            cur = tuple(b[rows, d] for b in buckets)
            new = ec_add(ctx, b3, cur, P_j)
            return tuple(b.at[rows, d].set(nc) for b, nc in zip(buckets, new))

        buckets = jax.lax.fori_loop(0, chunk, step, buckets)

        # reduce lanes: [K, B] -> [B]
        bX, bY, bZ = buckets
        while bX.shape[0] > 1:
            half = bX.shape[0] // 2
            bX, bY, bZ = ec_add(
                ctx, b3,
                (bX[:half], bY[:half], bZ[:half]),
                (bX[half:], bY[half:], bZ[half:]),
            )

        # weighted sum over buckets 1..B-1 = total of suffix sums:
        # inclusive suffix scan via Hillis-Steele (log2 B steps, 1 add each)
        sX, sY, sZ = bX[0, 1:], bY[0, 1:], bZ[0, 1:]  # buckets 1..B-1
        M = B - 1
        pos = jnp.arange(M)

        def hs_step(i, s):
            sX, sY, sZ = s
            shift = 1 << i
            shX = jnp.roll(sX, -shift, axis=0)
            shY = jnp.roll(sY, -shift, axis=0)
            shZ = jnp.roll(sZ, -shift, axis=0)
            aX, aY, aZ = ec_add(ctx, b3, (sX, sY, sZ), (shX, shY, shZ))
            valid = (pos + shift < M)[:, None]
            return (
                jnp.where(valid, aX, sX),
                jnp.where(valid, aY, sY),
                jnp.where(valid, aZ, sZ),
            )

        n_steps = (M - 1).bit_length()
        sX, sY, sZ = jax.lax.fori_loop(0, n_steps, hs_step, (sX, sY, sZ))
        # suffix[k] now = sum_{b>=k+1} S_b; window total = sum_k suffix[k]
        total = _tree_reduce_1d(ctx, b3, (sX, sY, sZ))
        return carry, total

    _, sums = jax.lax.scan(window_sum, None, digs)  # ([W, L],)*3

    # Horner across windows (high first): result = 2^c * result + sum_w
    def horner(i, result):
        w = W - 1 - i

        def double(_, r):
            return ec_add(ctx, b3, r, r)

        result = jax.lax.fori_loop(0, c, double, result)
        window = tuple(
            jax.lax.dynamic_index_in_dim(s, w, 0, keepdims=False) for s in sums
        )
        return ec_add(ctx, b3, result, window)

    first = tuple(s[W - 1] for s in sums)
    return jax.lax.fori_loop(1, W, horner, first)


def _tree_reduce_1d(ctx: FieldCtx, b3: jnp.ndarray, points: Point) -> Point:
    X, Y, Z = points
    while X.shape[0] > 1:
        n = X.shape[0]
        if n % 2:
            ident = ec_identity(ctx, (1,))
            X = jnp.concatenate([X, ident[0]])
            Y = jnp.concatenate([Y, ident[1]])
            Z = jnp.concatenate([Z, ident[2]])
        X, Y, Z = ec_add(
            ctx, b3, (X[0::2], Y[0::2], Z[0::2]), (X[1::2], Y[1::2], Z[1::2])
        )
    return (X[0], Y[0], Z[0])
