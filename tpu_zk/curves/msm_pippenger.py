"""Pippenger (bucket-method) MSM: window-batched lane-parallel accumulation.

TPU shape analysis: field ops hit compute-bound throughput only on >=10^6-limb
arrays (mont_mul on 2^20 elements runs in ~0.2 ms), so the kernel keeps every
sequential step maximally wide.  All W windows accumulate simultaneously:
buckets live as a ``[W, K, 2^c]`` point table, and each of the N/K serial
steps performs ONE complete EC add across W*K lanes (every window adds the
same chunk point into its own bucket row; row indices are per-lane unique so
gather/scatter need no combining).  Lanes then tree-reduce (log2 K wide
adds), the weighted bucket sum collapses via a Hillis-Steele suffix scan
over the bucket axis, and windows combine through a log-depth scaled tree
(4 doublings + 1 add per level) instead of a serial Horner walk.

Work: N*W + W*K*2^c point-adds with ~N/K sequential steps -- at 2^20 with
c=4, K=8192: 128 steps of ~0.5M-lane adds, ~8x less work than double-and-add
and two orders of magnitude fewer narrow dispatches than a per-window loop.

Group associativity + final affine normalization keep results bit-identical
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
    parts = [(scalar_limbs >> np.uint32(s)) & np.uint32((1 << c) - 1) for s in range(0, 16, c)]
    return jnp.stack(parts, axis=-1).reshape(scalar_limbs.shape[0], -1)


def _pick_lanes(N: int) -> int:
    # bucket table + lane-reduce temporaries scale with W*K*B; K=2048 keeps
    # them under ~1GB on a 16GB chip while steps stay >=128k lanes wide
    k = max(64, min(2048, N // 64))
    return 1 << (k.bit_length() - 1)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def msm_pippenger(
    ctx: FieldCtx, b3: jnp.ndarray, inputs, c: int = 4, lanes: int | None = None
) -> Point:
    """inputs = (points ([N,L],)*3, scalar_limbs_plain [N,Lr]) -> single point."""
    points, scalar_limbs = inputs
    N = points[0].shape[0]
    # Small problems (and the CPU test backend) don't amortize the Pippenger
    # machinery: its bucket graph costs minutes of XLA:CPU compile time for a
    # 4-point MSM.  Batched double-and-add is one small fori_loop program and
    # produces the identical group element.
    if jax.default_backend() != "tpu" or N < 2048:
        from .ec_device import msm

        shifts = jnp.arange(16, dtype=jnp.uint32)
        bits = ((scalar_limbs[..., None] >> shifts) & np.uint32(1)).reshape(N, -1)
        return msm(ctx, b3, points, bits)
    B = 1 << c
    # TPU path: whole bucket-accumulation phase in one Pallas dispatch with
    # the bucket table VMEM-resident per window (ec_pallas.msm_buckets_pallas)
    use_kernel = jax.default_backend() == "tpu" and N >= 2048 and c <= 5
    if use_kernel:
        K = min(1024, max(128, 1 << ((N // 8).bit_length() - 1)))
        modulus = 8 * K  # digit blocks are 8 chunk-steps tall
    else:
        K = lanes or _pick_lanes(N)
        modulus = K
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

    digits = _digits(scalar_limbs, c)  # [N, W]
    W = digits.shape[1]
    chunk = N // K

    if use_kernel:
        from .ec_pallas import msm_buckets_pallas

        pts = tuple(coord.reshape(chunk, K, ctx.L) for coord in points)
        digs = digits.reshape(chunk, K, W).transpose(2, 0, 1)  # [W, chunk, K]
        bkt = msm_buckets_pallas(ctx, b3, pts, digs, B)  # ([W, B, K, L],)*3
        buckets = tuple(x.transpose(0, 2, 1, 3) for x in bkt)  # [W, K, B, L]
    else:
        pts = tuple(coord.reshape(K, chunk, ctx.L) for coord in points)
        digs = digits.reshape(K, chunk, W).transpose(1, 2, 0)  # [chunk, W, K]
        krows = jnp.broadcast_to(jnp.arange(K)[None, :], (W, K))
        wrows = jnp.broadcast_to(jnp.arange(W)[:, None], (W, K))

        buckets = ec_identity(ctx, (W, K, B))

        def step(j, buckets):
            d = jax.lax.dynamic_index_in_dim(digs, j, axis=0, keepdims=False)  # [W, K]
            P_j = tuple(
                jnp.broadcast_to(
                    jax.lax.dynamic_index_in_dim(cc, j, axis=1, keepdims=False)[None],
                    (W, K, ctx.L),
                )
                for cc in pts
            )
            cur = tuple(b[wrows, krows, d] for b in buckets)
            new = ec_add(ctx, b3, cur, P_j)
            return tuple(b.at[wrows, krows, d].set(nc) for b, nc in zip(buckets, new))

        buckets = jax.lax.fori_loop(0, chunk, step, buckets)

    # reduce lanes: [W, K, B] -> [W, B]
    bX, bY, bZ = buckets
    while bX.shape[1] > 1:
        half = bX.shape[1] // 2
        bX, bY, bZ = ec_add(
            ctx, b3,
            (bX[:, :half], bY[:, :half], bZ[:, :half]),
            (bX[:, half:], bY[:, half:], bZ[:, half:]),
        )
    bX, bY, bZ = bX[:, 0], bY[:, 0], bZ[:, 0]  # [W, B]

    # weighted sum over buckets 1..B-1 per window = total of suffix sums
    sX, sY, sZ = bX[:, 1:], bY[:, 1:], bZ[:, 1:]  # [W, B-1]
    M = B - 1
    pos = jnp.arange(M)[None, :]

    def hs_step(i, s):
        sX, sY, sZ = s
        shift = 1 << i
        shX = jnp.roll(sX, -shift, axis=1)
        shY = jnp.roll(sY, -shift, axis=1)
        shZ = jnp.roll(sZ, -shift, axis=1)
        aX, aY, aZ = ec_add(ctx, b3, (sX, sY, sZ), (shX, shY, shZ))
        valid = (pos + shift < M)[..., None]
        return (
            jnp.where(valid, aX, sX),
            jnp.where(valid, aY, sY),
            jnp.where(valid, aZ, sZ),
        )

    n_steps = max((M - 1).bit_length(), 0)
    sX, sY, sZ = jax.lax.fori_loop(0, n_steps, hs_step, (sX, sY, sZ))
    # sum the W x (B-1) suffix values along the bucket axis -> per-window totals
    wins = _tree_reduce_axis1(ctx, b3, (sX, sY, sZ))  # [W]

    # combine windows: log-depth scaled tree, each level pairs (even, odd)
    # windows as even + 2^c * odd, so only c doublings + 1 add per level
    X, Y, Z = wins
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


def _tree_reduce_axis1(ctx: FieldCtx, b3: jnp.ndarray, points: Point) -> Point:
    X, Y, Z = points
    while X.shape[1] > 1:
        n = X.shape[1]
        if n % 2:
            ident = ec_identity(ctx, (X.shape[0], 1))
            X = jnp.concatenate([X, ident[0]], axis=1)
            Y = jnp.concatenate([Y, ident[1]], axis=1)
            Z = jnp.concatenate([Z, ident[2]], axis=1)
        X, Y, Z = ec_add(
            ctx, b3,
            (X[:, 0::2], Y[:, 0::2], Z[:, 0::2]),
            (X[:, 1::2], Y[:, 1::2], Z[:, 1::2]),
        )
    return (X[:, 0], Y[:, 0], Z[:, 0])
