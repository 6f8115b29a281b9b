"""Pallas TPU kernels for the field hot loops.

Why: the XLA-graph Montgomery multiply materializes every loop intermediate
to HBM (~300 passes over the table, 42 ms at 2^20 on v5e); these kernels
keep the entire CIOS loop in VMEM so a multiply costs ~3 HBM passes (read
a, read b, write out) -- the memory-bound speed of light.

In-kernel layout is limb-major ([L, BN] tiles): the element axis rides the
128-wide lane dimension at full utilization while limb shifts become cheap
sublane moves.  Blocks arrive limb-minor ([BN, L]) matching the framework
layout and are transposed on load/store inside VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .arith import BASE, LIMB_BITS, MASK, FieldCtx, _limbs_of_int

DEFAULT_BLOCK = 1024


def _propagate_rows(t: jnp.ndarray, out_rows: int) -> jnp.ndarray:
    """Carry-propagate along axis 0 (limb-major): lazy [W, ...] -> strict."""
    W = t.shape[0]
    rest = t.shape[1:]
    if out_rows > W:
        t = jnp.concatenate([t, jnp.zeros((out_rows - W, *rest), jnp.uint32)], 0)

    def shift_up(x, k=1):
        return jnp.concatenate([jnp.zeros((k, *rest), jnp.uint32), x[:-k]], 0)

    for _ in range(2):
        t = (t & MASK) + shift_up(t >> LIMB_BITS)
    g = t >> LIMB_BITS
    r = t & MASK
    p = (r == MASK).astype(jnp.uint32)
    d = 1
    while d < out_rows:
        g = g | (p & shift_up(g, d))
        p = p & shift_up(p, d)
        d *= 2
    return (r + shift_up(g, 1)) & MASK


def _col(consts: jnp.ndarray, row: int, width: int, ndim: int) -> jnp.ndarray:
    """Constant row as a [width, 1, ..., 1] column broadcastable at rank ndim.

    consts comes in two layouts: the classic 2-D ``[rows, L+1]`` (only valid
    for rank <= 2 data -- Mosaic cannot shape-cast a lane-major 1-D vector to
    rank >= 3) and the sublane-major 3-D ``[rows, L+1, 1]``, whose ``[W, 1]``
    column slices Mosaic happily broadcast-in-dims to any rank.
    """
    if consts.ndim == 3:
        c2 = consts[row, :width]  # [W, 1], value on sublanes
        if ndim <= 2:
            return c2
        return jax.lax.broadcast_in_dim(c2, (width,) + (1,) * (ndim - 1), (0, 1))
    assert ndim <= 2, "rank >= 3 kernels must pass sublane-major [rows, L+1, 1] consts"
    return consts[row, :width][:, None]


def _cond_sub_rows(t: jnp.ndarray, consts: jnp.ndarray, row: int, L: int) -> jnp.ndarray:
    """Subtract p if value >= p.  t: strict [W, ...]; consts row = B^W - p."""
    W = t.shape[0]
    d = _propagate_rows(t + _col(consts, row, W, t.ndim), W + 1)
    ge = d[W] != 0
    return jnp.where(ge[None], d[:W], t)[:L]


def _mont_mul_rows(ctx: FieldCtx, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """CIOS on limb-major tiles: [L, ...] x [L, ...] -> [L, ...] (broadcasting).

    consts: [2, L+1] -- row 0 = p limbs (padded), row 1 = B^(L+1) - p.
    """
    L = ctx.L
    rest = jnp.broadcast_shapes(at.shape[1:], bt.shape[1:])
    ndim = len(rest) + 1
    n = _col(consts, 0, L, ndim)
    n0inv = np.uint32(ctx.n0inv)
    zero_row = jnp.zeros((1, *rest), jnp.uint32)
    t = jnp.zeros((L + 2, *rest), jnp.uint32)
    for i in range(L):
        p_full = at[i : i + 1] * bt  # [L, ...], exact u32
        t = t + jnp.concatenate([p_full & MASK, zero_row, zero_row], 0)
        t = t + jnp.concatenate([zero_row, p_full >> LIMB_BITS, zero_row], 0)
        m = (t[0:1] * n0inv) & MASK
        q = m * n
        t = t + jnp.concatenate([q & MASK, zero_row, zero_row], 0)
        t = t + jnp.concatenate([zero_row, q >> LIMB_BITS, zero_row], 0)
        carry = t[0:1] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry, t[2:], zero_row], 0)
    strict = _propagate_rows(t[: L + 1], L + 1)
    return _cond_sub_rows(strict, consts, 1, L)


def _mont_mul_kernel(ctx: FieldCtx, a_ref, b_ref, c_ref, o_ref):
    at = a_ref[:].T  # [L, BN]
    bt = b_ref[:].T
    o_ref[:] = _mont_mul_rows(ctx, at, bt, c_ref[:]).T


@functools.lru_cache(maxsize=None)
def _consts_for(name: str) -> np.ndarray:
    from .arith import _comp_limbs, field_ctx

    ctx = field_ctx(name)
    L = ctx.L
    out = np.zeros((4, L + 1), np.uint32)
    out[0, :L] = ctx.p_limbs
    out[1] = _comp_limbs(ctx.p, L + 1)
    out[2, :L] = _comp_limbs(ctx.p, L)
    out[3, :L] = _limbs_of_int(ctx.R % ctx.p, L)  # one in Montgomery form
    return out


def _add_rows(ctx: FieldCtx, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """Modular add on limb-major strict canonical tiles [L, ...]."""
    s = at + bt
    strict = _propagate_rows(s, ctx.L + 1)
    return _cond_sub_rows(strict, consts, 1, ctx.L)


def _sub_rows(ctx: FieldCtx, at: jnp.ndarray, bt: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """Modular sub on limb-major strict canonical tiles: a - b + p, reduce."""
    L = ctx.L
    t = at + (MASK - bt) + _col(consts, 0, L, max(at.ndim, bt.ndim))
    t = jnp.concatenate([t[:1] + 1, t[1:]], 0)  # completes B^L - b
    # value = a - b + p + B^L with a-b+p in (0, 2p) and 2p < B^L: the B^L bit
    # lands in row L after propagation, low L rows are exactly a - b + p
    strict = _propagate_rows(t, L + 1)[:L]
    return _cond_sub_rows(strict, consts, 2, L)


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Montgomery product via a VMEM-resident Pallas kernel.

    a, b: [N, L] canonical; N must be a multiple of ``block`` (caller pads).
    """
    N, L = a.shape
    grid = (N // block,)
    consts = jnp.asarray(_consts_for(ctx.name))
    return pl.pallas_call(
        functools.partial(_mont_mul_kernel, ctx),
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b, consts)


# ---------------------------------------------------------------------------
# standalone modular add / sub (one HBM pass instead of the multi-pass
# XLA carry-propagation graph, which costs 2.5x a full Montgomery multiply)
# ---------------------------------------------------------------------------


def _addsub_kernel(ctx: FieldCtx, op, a_ref, b_ref, c_ref, o_ref):
    rows = op(ctx, a_ref[:].T, b_ref[:].T, c_ref[:])
    o_ref[:] = rows.T


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def addsub_pallas(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, kind: str, block: int = DEFAULT_BLOCK) -> jnp.ndarray:
    """Elementwise modular add/sub: a, b [N, L] canonical, N % block == 0."""
    N, L = a.shape
    op = _add_rows if kind == "add" else _sub_rows
    consts = jnp.asarray(_consts_for(ctx.name))
    return pl.pallas_call(
        functools.partial(_addsub_kernel, ctx, op),
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b, consts)


# ---------------------------------------------------------------------------
# fused sumcheck fold: folded = lo + r*(hi - lo) in ONE HBM pass, with the
# two half-sums of the folded table accumulated in VMEM along the way
# ---------------------------------------------------------------------------


def _fold_kernel(ctx: FieldCtx, lo_ref, hi_ref, r_ref, c_ref, o_ref, s_ref):
    L = ctx.L
    consts = c_ref[:]
    lo = lo_ref[0].T  # [L, BN]
    hi = hi_ref[0].T
    rt = jnp.broadcast_to(r_ref[0][:, None], lo.shape)
    d = _sub_rows(ctx, hi, lo, consts)
    m = _mont_mul_rows(ctx, d, rt, consts)
    o = _add_rows(ctx, m, lo, consts)
    o_ref[0] = o.T

    # lazy block sum of the folded values -> strict [L+2] row (Montgomery
    # form); the whole per-row block-sum table stays VMEM-resident across j
    # Mosaic lacks u32 reductions; values < BN*2^16 < 2^31 are sign-safe
    s = jnp.sum(o.astype(jnp.int32), axis=1).astype(jnp.uint32)
    ss = _propagate_rows(s[:, None], L + 2)[:, 0]
    j = pl.program_id(1)
    s_ref[0, j] = ss


@functools.partial(jax.jit, static_argnums=(0, 3))
def fold_pallas(ctx: FieldCtx, flat: jnp.ndarray, r: jnp.ndarray, block: int = DEFAULT_BLOCK):
    """Fold variable 0 of each row: flat [B, 2T, L] -> ([B, T, L], [B, G, L+2]).

    Returns the folded tables and, per row, strict wide per-block sums of the
    folded table (G = T/block rows; reduce row ranges with
    ``arith.reduce_wide_to_mont`` to get e.g. the two half-sums = the next
    round univariate).  T must be a multiple of ``block``.
    """
    B, N2, L = flat.shape
    T = N2 // 2
    nblocks = T // block
    consts = jnp.asarray(_consts_for(ctx.name))
    r2 = r.reshape(1, L)
    return pl.pallas_call(
        functools.partial(_fold_kernel, ctx),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, nblocks, L + 2), jnp.uint32),
        ),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, block, L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, L), lambda b, j, _n=nblocks: (b, j + _n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblocks, L + 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != "tpu",
    )(flat, flat, r2, consts)


# ---------------------------------------------------------------------------
# limb-major elementwise kernels: operands [L, N] (element axis on lanes)
#
# The [N, L] layout wastes 7/8 of every lane (L=16 of 128) and runs HBM DMA
# at ~1/6 of the measured ceiling; these variants take limb-major arrays,
# skip the in-kernel transpose, and use every lane.  Same math, bit-identical.
# ---------------------------------------------------------------------------


def _mont_mul_lm_kernel(ctx: FieldCtx, a_ref, b_ref, c_ref, o_ref):
    o_ref[:] = _mont_mul_rows(ctx, a_ref[:], b_ref[:], c_ref[:])


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_lm_pallas(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """Montgomery product of limb-major arrays: a, b [L, N] -> [L, N];
    N must be a multiple of ``block``."""
    L, N = a.shape
    consts = jnp.asarray(_consts_for(ctx.name))
    return pl.pallas_call(
        functools.partial(_mont_mul_lm_kernel, ctx),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b, consts)


def _addsub_lm_kernel(ctx: FieldCtx, op, a_ref, b_ref, c_ref, o_ref):
    o_ref[:] = op(ctx, a_ref[:], b_ref[:], c_ref[:])


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def addsub_lm_pallas(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, kind: str, block: int = 2048) -> jnp.ndarray:
    """Elementwise modular add/sub on limb-major arrays [L, N]."""
    L, N = a.shape
    op = _add_rows if kind == "add" else _sub_rows
    consts = jnp.asarray(_consts_for(ctx.name))
    return pl.pallas_call(
        functools.partial(_addsub_lm_kernel, ctx, op),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(a, b, consts)
