"""Pallas TPU kernels for elliptic-curve hot loops.

The Pippenger bucket-accumulation phase is the MSM bottleneck: per chunk
step it gathers each lane's current bucket, performs one complete EC add,
and scatters the result back.  Done as XLA ops this costs ~12 ms/step at
[64 windows x 256 lanes] (gather/scatter lowering + ~30 HBM round trips for
the RCB formula's intermediates).  This kernel keeps the whole per-window
bucket table in VMEM scratch across the chunk loop and replaces
gather/scatter with one-hot selects over the (small) bucket axis, so the
only HBM traffic is streaming the points in once per window.

EC formula: Renes-Costello-Batina 2015 Algorithm 7 (complete, a = 0), the
same op order as ``ec_device.ec_add`` -- results are bit-identical.
Replaces the reference's sequential map+sum MSM
(``multilinear_kzg/src/multilinear_kzg.rs:37-44``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import rows13
from ..fields.arith import FieldCtx
from ..fields.pallas_kernels import (
    _add_rows,
    _consts_for,
    _mont_mul_rows,
    _sub_rows,
)
from ..fields.rows13 import Ctx13

Rows = tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # limb-major [L, K] coords


def _ec_add_rows(ctx: FieldCtx, consts: jnp.ndarray, b3t: jnp.ndarray, P: Rows, Q: Rows) -> Rows:
    """Complete projective add on limb-major tiles (RCB Alg 7, a = 0)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul = lambda a, b: _mont_mul_rows(ctx, a, b, consts)
    add = lambda a, b: _add_rows(ctx, a, b, consts)
    sub = lambda a, b: _sub_rows(ctx, a, b, consts)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)  # X1Y2 + X2Y1
    t4 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)  # Y1Z2 + Y2Z1
    t5 = sub(sub(mul(add(X1, Z1), add(X2, Z2)), t0), t2)  # X1Z2 + X2Z1
    t2b3 = mul(b3t, t2)
    y3g = mul(b3t, t5)
    three_t0 = add(add(t0, t0), t0)
    z3t = add(t1, t2b3)
    t1m = sub(t1, t2b3)
    X3 = sub(mul(t3, t1m), mul(t4, y3g))
    Y3 = add(mul(y3g, three_t0), mul(t1m, z3t))
    Z3 = add(mul(z3t, t4), mul(three_t0, t3))
    return X3, Y3, Z3


def _msm_bucket_kernel(
    ctx: FieldCtx,
    B: int,
    chunk: int,
    px_ref, py_ref, pz_ref, dig_ref, b3_ref, c_ref,
    ox_ref, oy_ref, oz_ref,
    sx, sy, sz,
):
    L = ctx.L
    K = sx.shape[2]
    consts = c_ref[:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        zero = jnp.zeros((B, L, K), jnp.uint32)
        one = jnp.broadcast_to(consts[3, :L][None, :, None], (B, L, K))
        sx[:] = zero  # identity = (0 : 1 : 0), Montgomery form
        sy[:] = one
        sz[:] = zero

    d = dig_ref[0, j % 8]  # [K] digits of this chunk step
    Q = (px_ref[0].T, py_ref[0].T, pz_ref[0].T)  # [L, K]
    b3t = jnp.broadcast_to(b3_ref[0][:, None], (L, K))

    # gather each lane's current bucket by one-hot select over the bucket axis
    masks = [(d == np.uint32(b))[None, :] for b in range(B)]
    curX, curY, curZ = sx[0], sy[0], sz[0]
    for b in range(1, B):
        curX = jnp.where(masks[b], sx[b], curX)
        curY = jnp.where(masks[b], sy[b], curY)
        curZ = jnp.where(masks[b], sz[b], curZ)

    X3, Y3, Z3 = _ec_add_rows(ctx, consts, b3t, (curX, curY, curZ), Q)

    for b in range(B):
        sx[b] = jnp.where(masks[b], X3, sx[b])
        sy[b] = jnp.where(masks[b], Y3, sy[b])
        sz[b] = jnp.where(masks[b], Z3, sz[b])

    @pl.when(j == chunk - 1)
    def _():
        ox_ref[0] = sx[:].transpose(0, 2, 1)  # [B, K, L]
        oy_ref[0] = sy[:].transpose(0, 2, 1)
        oz_ref[0] = sz[:].transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnums=(0, 4))
def msm_buckets_pallas(ctx: FieldCtx, b3: jnp.ndarray, points, digits_wjk: jnp.ndarray, B: int):
    """Bucket accumulation for all windows in one dispatch.

    points: 3 coords [chunk, K, L] (Montgomery projective; point index j*K+k).
    digits_wjk: [W, chunk, K] uint32, values < B; chunk % 8 == 0, K % 128 == 0.
    Returns bucket points ([W, B, K, L],)*3: lane k of window w holds the sum
    of its chunk's points whose window-w digit selected bucket b.
    """
    W, chunk, K = digits_wjk.shape
    L = ctx.L
    consts = jnp.asarray(_consts_for(ctx.name))
    b3r = b3.reshape(1, L)
    out = jax.ShapeDtypeStruct((W, B, K, L), jnp.uint32)
    coord_spec = pl.BlockSpec((1, K, L), lambda w, j: (j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_msm_bucket_kernel, ctx, B, chunk),
        out_shape=(out, out, out),
        grid=(W, chunk),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec((1, 8, K), lambda w, j: (w, j // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda w, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda w, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, K, L), lambda w, j: (w, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K, L), lambda w, j: (w, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, K, L), lambda w, j: (w, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, L, K), jnp.uint32),
            pltpu.VMEM((B, L, K), jnp.uint32),
            pltpu.VMEM((B, L, K), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(points[0], points[1], points[2], digits_wjk, b3r, consts)


# ---------------------------------------------------------------------------
# MSM bucket kernel v2: radix-2^13 limbs, signed base-32 digits, in-kernel
# partial reduction.  ~1.8x the 16-bit unsigned kernel above per point:
# 53 windows instead of 64 (signed digits reuse the same 16 buckets for
# magnitudes 1..16) and each Montgomery multiply runs in the lazy radix-13
# scheme (fields/rows13.py) with ~1.5x fewer VPU ops.
# ---------------------------------------------------------------------------

KOUT = 128  # lanes left after the in-kernel per-bucket reduction


def _ec_add_rows13(ctx13: Ctx13, consts: jnp.ndarray, b3t: jnp.ndarray, P, Q):
    """Complete projective add (RCB Alg 7, a = 0) on radix-13 limb rows."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    mul = lambda a, b: rows13.mont_mul13(ctx13, a, b, consts)
    add = lambda a, b: rows13.add13(ctx13, a, b, consts)
    sub = lambda a, b: rows13.sub13(ctx13, a, b, consts)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(sub(mul(add(X1, Y1), add(X2, Y2)), t0), t1)
    t4 = sub(sub(mul(add(Y1, Z1), add(Y2, Z2)), t1), t2)
    t5 = sub(sub(mul(add(X1, Z1), add(X2, Z2)), t0), t2)
    t2b3 = mul(b3t, t2)
    y3g = mul(b3t, t5)
    three_t0 = add(add(t0, t0), t0)
    z3t = add(t1, t2b3)
    t1m = sub(t1, t2b3)
    X3 = sub(mul(t3, t1m), mul(t4, y3g))
    Y3 = add(mul(y3g, three_t0), mul(t1m, z3t))
    Z3 = add(mul(z3t, t4), mul(three_t0, t3))
    return X3, Y3, Z3


def _msm13_kernel(
    ctx13: Ctx13,
    B: int,
    chunk: int,
    px_ref, py_ref, pz_ref, dig_ref, b3_ref, c_ref,
    ox_ref, oy_ref, oz_ref,
    sx, sy, sz,
):
    L = ctx13.L
    K = sx.shape[2]
    consts = c_ref[:]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        zero = jnp.zeros((B, L, K), jnp.uint32)
        one = jnp.broadcast_to(consts[3, :L][None, :, None], (B, L, K))
        sx[:] = zero  # identity = (0 : 1 : 0), Montgomery-R13 form
        sy[:] = one
        sz[:] = zero

    code = dig_ref[0, j % 8]  # [K] packed digits: idx | sign<<5 | skip<<6
    idx = code & np.uint32(31)
    sign = (code >> np.uint32(5)) & np.uint32(1)
    skip = (code >> np.uint32(6)) & np.uint32(1)

    Qx, Qy, Qz = px_ref[0].T, py_ref[0].T, pz_ref[0].T  # [L, K]
    # signed digit: negate Y for negative magnitudes (p - y; complete even at y=0)
    y_neg = rows13.sub13(ctx13, jnp.zeros_like(Qy), Qy, consts)
    Qy = jnp.where((sign == 1)[None, :], y_neg, Qy)
    b3t = jnp.broadcast_to(b3_ref[0][:, None], (L, K))

    masks = [(idx == np.uint32(b))[None, :] for b in range(B)]
    curX, curY, curZ = sx[0], sy[0], sz[0]
    for b in range(1, B):
        curX = jnp.where(masks[b], sx[b], curX)
        curY = jnp.where(masks[b], sy[b], curY)
        curZ = jnp.where(masks[b], sz[b], curZ)

    X3, Y3, Z3 = _ec_add_rows13(ctx13, consts, b3t, (curX, curY, curZ), (Qx, Qy, Qz))

    live = (skip == 0)[None, :]
    for b in range(B):
        m = masks[b] & live
        sx[b] = jnp.where(m, X3, sx[b])
        sy[b] = jnp.where(m, Y3, sy[b])
        sz[b] = jnp.where(m, Z3, sz[b])

    @pl.when(j == chunk - 1)
    def _():
        # per-bucket lane reduction K -> KOUT (halvings stay >= 128 wide);
        # b3 re-broadcasts per width -- slicing a stride-0 broadcast crashes
        # the Mosaic lowerer
        b3w = lambda w: jax.lax.broadcast_in_dim(b3_ref[0], (L, w), (0,))
        add_pt = lambda P, Q: _ec_add_rows13(ctx13, consts, b3w(KOUT), P, Q)
        buckets = []
        for b in range(B):
            rX, rY, rZ = sx[b], sy[b], sz[b]
            w = K
            while w > KOUT:
                w //= 2
                rX, rY, rZ = _ec_add_rows13(
                    ctx13, consts, b3w(w),
                    (rX[:, :w], rY[:, :w], rZ[:, :w]),
                    (rX[:, w:2 * w], rY[:, w:2 * w], rZ[:, w:2 * w]),
                )
            buckets.append((rX, rY, rZ))
        # ... then the weighted bucket total via running suffix sums:
        # acc_b = sum_{j>=b} S_j, total = sum_b acc_b = sum_b (b+1) S_b
        zero = jnp.zeros((L, KOUT), jnp.uint32)
        one = jnp.broadcast_to(consts[3, :L][:, None], (L, KOUT))
        acc = (zero, one, zero)
        tot = (zero, one, zero)
        for b in reversed(range(B)):
            acc = add_pt(acc, buckets[b])
            tot = add_pt(tot, acc)
        ox_ref[0] = tot[0].T  # [KOUT, L]
        oy_ref[0] = tot[1].T
        oz_ref[0] = tot[2].T


@functools.partial(jax.jit, static_argnums=(0, 4))
def msm_buckets13_pallas(ctx13: Ctx13, b3_13: jnp.ndarray, points13, codes_wjk: jnp.ndarray, B: int = 16):
    """Signed-digit bucket accumulation + partial reduction, one dispatch.

    points13: 3 coords [chunk, K, L13] (Montgomery-R13 projective).
    codes_wjk: [W, chunk, K] packed signed digits; chunk % 8 == 0, K % 256 == 0.
    Returns ([W, KOUT, L13],)*3: per window, KOUT partial sums whose total is
    the window's weighted bucket sum.
    """
    W, chunk, K = codes_wjk.shape
    L = ctx13.L
    consts = jnp.asarray(ctx13.consts())
    b3r = b3_13.reshape(1, L)
    out = jax.ShapeDtypeStruct((W, KOUT, L), jnp.uint32)
    coord_spec = pl.BlockSpec((1, K, L), lambda w, j: (j, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_msm13_kernel, ctx13, B, chunk),
        out_shape=(out, out, out),
        grid=(W, chunk),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec((1, 8, K), lambda w, j: (w, j // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda w, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda w, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, KOUT, L), lambda w, j: (w, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KOUT, L), lambda w, j: (w, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KOUT, L), lambda w, j: (w, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, L, K), jnp.uint32),
            pltpu.VMEM((B, L, K), jnp.uint32),
            pltpu.VMEM((B, L, K), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(points13[0], points13[1], points13[2], codes_wjk, b3r, consts)
