"""Device (TPU) elliptic-curve kernels over limb-packed coordinates.

Points are projective (X : Y : Z), a = 0, each coordinate a ``[..., L]``
Montgomery limb array.  Addition is the Renes-Costello-Batina *complete*
formula -- branch-free, so it vectorizes over the point axis with no
divergence (SURVEY.md section 7 hard-part #3: "use complete or unified
addition formulas").  The same formula runs on the host oracle
(``host_ec.ec_add``); tests cross-check the two.

MSM: batched double-and-add over scalar bits (one conditional complete add +
one doubling per bit across all N lanes) followed by a log-depth pairwise
tree reduction.  Scalars arrive as *plain* (non-Montgomery) limb arrays; bit
extraction is a device-side shift/mask.  Replaces the reference's sequential
``map + sum`` MSM (``multilinear_kzg/src/multilinear_kzg.rs:37-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx, field_ctx
from .host_ec import HostCurve
from .params import CURVES

Point = tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) limbs


def ec_add(ctx: FieldCtx, b3: jnp.ndarray, P: Point, Q: Point) -> Point:
    """Complete projective addition (RCB 2015 Algorithm 7, a = 0).

    The 12 field multiplies are batched into 3 stacked mont_mul calls (6+2+6
    independent products per stage), which shrinks the XLA graph ~4x and
    feeds the VPU wider batches.
    """
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    X1, X2 = jnp.broadcast_arrays(X1, X2)
    Y1, Y2 = jnp.broadcast_arrays(Y1, Y2)
    Z1, Z2 = jnp.broadcast_arrays(Z1, Z2)
    add = lambda a, b: arith.add(ctx, a, b)
    sub = lambda a, b: arith.sub(ctx, a, b)

    # stage A: 6 independent products
    sums_l = add(jnp.stack([X1, Y1, X1]), jnp.stack([Y1, Z1, Z1]))
    sums_r = add(jnp.stack([X2, Y2, X2]), jnp.stack([Y2, Z2, Z2]))
    lhs = jnp.concatenate([jnp.stack([X1, Y1, Z1]), sums_l])
    rhs = jnp.concatenate([jnp.stack([X2, Y2, Z2]), sums_r])
    prod = arith.mont_mul(ctx, lhs, rhs)
    t0, t1, t2 = prod[0], prod[1], prod[2]
    cross = sub(
        sub(prod[3:6], jnp.stack([t0, t1, t0])), jnp.stack([t1, t2, t2])
    )
    t3, t4, t5 = cross[0], cross[1], cross[2]  # X1Y2+X2Y1, Y1Z2+Y2Z1, X1Z2+X2Z1

    # stage B: 2 products with b3
    qb = arith.mont_mul(ctx, b3, jnp.stack([t2, t5]))
    t2b3, y3g = qb[0], qb[1]
    three_t0 = add(add(t0, t0), t0)
    z3t = add(t1, t2b3)
    t1m = sub(t1, t2b3)

    # stage C: 6 independent products
    cl = jnp.stack([t3, t4, y3g, t1m, z3t, three_t0])
    cr = jnp.stack([t1m, y3g, three_t0, z3t, t4, t3])
    u = arith.mont_mul(ctx, cl, cr)
    X3 = sub(u[0], u[1])
    Y3 = add(u[2], u[3])
    Z3 = add(u[4], u[5])
    return (X3, Y3, Z3)


def ec_select(mask: jnp.ndarray, P: Point, Q: Point) -> Point:
    """mask ? P : Q, per point lane.  mask: bool [...]."""
    m = mask[..., None]
    return tuple(jnp.where(m, p, q) for p, q in zip(P, Q))


def ec_identity(ctx: FieldCtx, shape=()) -> Point:
    zero = jnp.zeros(shape + (ctx.L,), jnp.uint32)
    one = jnp.broadcast_to(ctx.one_mont, shape + (ctx.L,))
    return (zero, one, zero)


def scalar_bits(fr: FieldCtx, scalar_limbs_plain: jnp.ndarray) -> jnp.ndarray:
    """[N, Lr] plain limbs -> [N, Lr*16] bits, LSB first."""
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (scalar_limbs_plain[..., None] >> shifts) & np.uint32(1)
    return bits.reshape(*scalar_limbs_plain.shape[:-1], fr.L * 16)


@functools.partial(jax.jit, static_argnums=(0,))
def batch_scalar_mul(ctx: FieldCtx, b3: jnp.ndarray, points: Point, bits: jnp.ndarray) -> Point:
    """points[i] * scalar[i] for all i: double-and-add over bit columns.

    points: ([N,L],)*3; bits: [N, B] (LSB first) -> ([N,L],)*3.
    """
    N = bits.shape[0]
    acc = ec_identity(ctx, (N,))
    state = (acc, points)

    def body(j, state):
        acc, base = state
        bit = jax.lax.dynamic_index_in_dim(bits, j, axis=1, keepdims=False)
        # one stacked complete add computes [acc+base ; base+base]
        P2 = tuple(jnp.concatenate([a, b]) for a, b in zip(acc, base))
        Q2 = tuple(jnp.concatenate([b, b]) for b in base)
        R = ec_add(ctx, b3, P2, Q2)
        added = tuple(r[:N] for r in R)
        doubled = tuple(r[N:] for r in R)
        acc = ec_select(bit == 1, added, acc)
        return (acc, doubled)

    acc, _ = jax.lax.fori_loop(0, bits.shape[1], body, state)
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def tree_reduce(ctx: FieldCtx, b3: jnp.ndarray, points: Point) -> Point:
    """Sum N points into one via log-depth pairwise complete adds."""
    X, Y, Z = points
    while X.shape[0] > 1:
        n = X.shape[0]
        if n % 2:
            ident = ec_identity(ctx, (1,))
            X = jnp.concatenate([X, ident[0]])
            Y = jnp.concatenate([Y, ident[1]])
            Z = jnp.concatenate([Z, ident[2]])
        P = (X[0::2], Y[0::2], Z[0::2])
        Q = (X[1::2], Y[1::2], Z[1::2])
        X, Y, Z = ec_add(ctx, b3, P, Q)
    return (X[0], Y[0], Z[0])


@functools.partial(jax.jit, static_argnums=(0,))
def msm(ctx: FieldCtx, b3: jnp.ndarray, points: Point, bits: jnp.ndarray) -> Point:
    """Multi-scalar multiplication: sum_i scalar_i * P_i -> single point [L]x3."""
    prods = batch_scalar_mul(ctx, b3, points, bits)
    return tree_reduce(ctx, b3, prods)


class DeviceCurve:
    """Facade bundling field contexts, constants, and host<->device point IO."""

    def __init__(self, curve_name: str):
        c = CURVES[curve_name]
        self.name = curve_name
        self.ctx = field_ctx(c["fq"])
        self.fr = field_ctx(c["fr"])
        self.b3 = self.ctx.scalar(3 * c["b"])
        self.host = HostCurve(curve_name)

    # -- host <-> device point conversion ------------------------------------
    def points_to_device(self, affine_points) -> Point:
        """List of affine (x, y) int pairs (or None for infinity) -> device point array."""
        xs, ys, zs = [], [], []
        for a in affine_points:
            if a is None:
                xs.append(0), ys.append(1), zs.append(0)
            else:
                xs.append(a[0]), ys.append(a[1]), zs.append(1)
        return (self.ctx.array(xs), self.ctx.array(ys), self.ctx.array(zs))

    def points_to_host(self, P: Point):
        """Device point array -> list of affine (x, y) int pairs / None."""
        Xs = self.ctx.to_ints(P[0]) if P[0].ndim > 1 else [self.ctx.to_ints(P[0])]
        Ys = self.ctx.to_ints(P[1]) if P[1].ndim > 1 else [self.ctx.to_ints(P[1])]
        Zs = self.ctx.to_ints(P[2]) if P[2].ndim > 1 else [self.ctx.to_ints(P[2])]
        out = []
        p = self.ctx.p
        for x, y, z in zip(Xs, Ys, Zs):
            if z == 0:
                out.append(None)
            else:
                zinv = pow(z, p - 2, p)
                out.append((x * zinv % p, y * zinv % p))
        return out

    def point_to_host(self, P: Point):
        return self.points_to_host(tuple(c[None, :] if c.ndim == 1 else c for c in P))[0]

    def scalars_to_bits(self, scalars: list[int]) -> jnp.ndarray:
        limbs = self.fr.array([s % self.fr.p for s in scalars], mont=False)
        return scalar_bits(self.fr, limbs)

    # -- high-level ops ------------------------------------------------------
    def msm_ints(self, affine_points, scalars: list[int]):
        """Host-convenience MSM: affine int points x int scalars -> affine point."""
        P = self.points_to_device(affine_points)
        bits = self.scalars_to_bits(scalars)
        return self.point_to_host(msm(self.ctx, self.b3, P, bits))
