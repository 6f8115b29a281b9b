"""Multi-device MSM: points + scalars sharded on the element axis.

Per-shard batched double-and-add runs with zero communication (purely
elementwise over the sharded axis); the pairwise tree reduction first
collapses within shards (contiguous halves -> no resharding) and only the
final log2(D) levels move points across devices (SURVEY.md section 2
parallelism table, row "MSM commit/open")."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..curves.ec_device import (
    DeviceCurve,
    Point,
    batch_scalar_mul,
    ec_add,
    ec_identity,
)
from ..fields.arith import FieldCtx
from .mesh import shard_leading


@functools.partial(jax.jit, static_argnums=(0,))
def tree_reduce_2d(ctx: FieldCtx, b3: jnp.ndarray, points: Point) -> Point:
    """[D, M] point array -> single point; local halves first, shards last."""
    X, Y, Z = points
    # within-shard reduction (contiguous halves keep everything local)
    while X.shape[1] > 1:
        m = X.shape[1]
        half = m // 2
        P = (X[:, :half], Y[:, :half], Z[:, :half])
        Q = (X[:, half : 2 * half], Y[:, half : 2 * half], Z[:, half : 2 * half])
        R = ec_add(ctx, b3, P, Q)
        if m % 2:
            X = jnp.concatenate([R[0], X[:, -1:]], axis=1)
            Y = jnp.concatenate([R[1], Y[:, -1:]], axis=1)
            Z = jnp.concatenate([R[2], Z[:, -1:]], axis=1)
        else:
            X, Y, Z = R
    X, Y, Z = X[:, 0], Y[:, 0], Z[:, 0]
    # cross-shard reduction
    while X.shape[0] > 1:
        d = X.shape[0]
        half = d // 2
        P = (X[:half], Y[:half], Z[:half])
        Q = (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half])
        R = ec_add(ctx, b3, P, Q)
        if d % 2:
            X = jnp.concatenate([R[0], X[-1:]])
            Y = jnp.concatenate([R[1], Y[-1:]])
            Z = jnp.concatenate([R[2], Z[-1:]])
        else:
            X, Y, Z = R
    return (X[0], Y[0], Z[0])


@functools.partial(jax.jit, static_argnums=(0,))
def sharded_msm_kernel(ctx: FieldCtx, b3: jnp.ndarray, points: Point, bits: jnp.ndarray) -> Point:
    """points: ([D, M, L],)*3 sharded on axis 0; bits: [D, M, B]."""
    D, M, L = points[0].shape
    flatP = tuple(c.reshape(D * M, L) for c in points)
    prods = batch_scalar_mul(ctx, b3, flatP, bits.reshape(D * M, -1))
    shaped = tuple(c.reshape(D, M, L) for c in prods)
    return tree_reduce_2d(ctx, b3, shaped)


def sharded_msm(dc: DeviceCurve, mesh, affine_points, scalars):
    """Host-convenience sharded MSM over a mesh."""
    D = mesh.devices.size
    n = len(affine_points)
    assert n % D == 0
    P = dc.points_to_device(affine_points)
    bits = dc.scalars_to_bits(scalars)
    Pm = tuple(shard_leading(mesh, c.reshape(D, n // D, -1)) for c in P)
    bitsm = shard_leading(mesh, bits.reshape(D, n // D, -1))
    out = sharded_msm_kernel(dc.ctx, dc.b3, Pm, bitsm)
    return dc.point_to_host(out)
