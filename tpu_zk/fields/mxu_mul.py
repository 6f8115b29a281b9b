"""MXU (systolic-array) kernels for multiply-by-constant field ops.

The VPU limb kernels (``pallas_kernels.py``) are compute-bound ~10x above
their roofline: a 254-bit CIOS multiply is ~2k scalar u32 ops per element and
the VPU is the only unit doing work.  But the sumcheck fold -- the framework's
headline op -- multiplies an entire table by ONE scalar per round
(``folded = lo + r*(hi - lo)``, reference ``evaluation_form.rs:61-106``).
Multiplication by a per-call constant is a *linear map over the limbs*:

    a * c  =  sum_j  nibble_j(a) * (c * 16^j mod p)

so a whole block of elements reduces to one small matrix multiply

    M[k, e]  =  sum_j  D[k, j] * A[j, e]        (MXU, bf16 x bf16 -> f32)

with A the 4-bit limb digits of the elements (exact in bf16) and D the byte
digits of the 128 reduced row constants ``c_t * 16^j mod p``.  Every product
is < 15*255 and every accumulator < 2^19: the f32 accumulation is exact, so
results are bit-identical to the CIOS kernels.  The fold uses two constants
(``lo*(1-r) + hi*r``), one fused matmul of shape [32, 128] x [128, block].

The epilogue (digit re-pack, carry propagation, one-hot correction of the
2^256-overflow, three conditional subtracts) runs on the VPU in VMEM; its
cost is ~100 row ops vs the CIOS kernel's ~2k.

Speed of light: the MXU at bf16 runs ~100x the VPU's u32-multiply rate, so
the fold becomes HBM-bound (3 table passes) instead of compute-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .arith import LIMB_BITS, MASK, FieldCtx, _limbs_of_int, mont_mul
from .pallas_kernels import _col, _propagate_rows

# the 2^(16L)-overflow limb h (one strict 16-bit limb) corrects via its four
# nibbles: corr = sum_g tab_g[nib_g(h)], each table 16 reduced rows -- covers
# any h < 2^16, which admits digit matmuls with up to 2^24-exact accumulators
_HN = 16


def _to_f32(x: jnp.ndarray) -> jnp.ndarray:
    """u32 (small values) -> f32; Mosaic lacks direct u32->float casts."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _f32_to_u32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.int32).astype(jnp.uint32)


@functools.lru_cache(maxsize=None)
def _static_tables(name: str):
    """Per-field host constants for the MXU pipeline."""
    from .arith import field_ctx

    ctx = field_ctx(name)
    L, p = ctx.L, ctx.p
    R = 1 << (LIMB_BITS * L)

    # plain limbs of 2^(16l+4g) mod p, nibble-group-major [4, L, L] (rows
    # for building D from a traced Montgomery scalar via one batched
    # mont_mul: mont_mul(c_hat, 2^s) = c_plain * 2^s mod p)
    m16 = np.stack(
        [np.stack([_limbs_of_int(pow(2, 16 * l + 4 * g, p), L) for l in range(L)]) for g in range(4)]
    )

    # overflow-limb correction tables: value + h*2^(16L) with
    # h = sum_g nib_g(h)*16^g, rows already reduced mod p, stored as
    # TRANSPOSED BYTE digits [4, 2L, 16] (low bytes then high bytes): one
    # one-hot matmul per nibble selects one row each.  Byte entries are
    # exact in bf16 -- Mosaic lowers f32 matmuls as single-pass bf16, which
    # silently rounds 16-bit table entries.
    def _tab_T_bytes(rows):
        limbs = np.stack(rows)  # [H, L]
        return np.concatenate([(limbs & 0xFF).T, (limbs >> 8).T], axis=0).astype(np.float32)

    htabs = np.stack([
        _tab_T_bytes([_limbs_of_int((m << (4 * g)) * R % p, L) for m in range(_HN)])
        for g in range(4)
    ])  # [4, 2L, 16]

    # conditional-subtract constants at width L+1: B^(L+1) - k*p.  The
    # epilogue value is < 2^(16L) + 2p < 16p for any L with p > B^L/14
    # (all supported fields), so an 8,4,2,1 chain always lands < p.
    W = L + 1
    BW = 1 << (LIMB_BITS * W)
    assert (1 << (LIMB_BITS * L)) + 4 * p < 16 * p
    comps = np.stack([_limbs_of_int(BW - k * p, W) for k in (8, 4, 2, 1)])
    return m16, htabs, comps


def const_rows(ctx: FieldCtx, c_mont: jnp.ndarray) -> jnp.ndarray:
    """Traced Montgomery scalars [k, L] -> plain row constants
    [k, 4, L, L]: rows[t, g, l] = limbs of (c_t_plain * 2^(16l+4g) mod p),
    matching :func:`_nibble_rows`'s nibble-group-major digit order."""
    m16 = jnp.asarray(_static_tables(ctx.name)[0])  # [4, L, L]
    k = c_mont.shape[0]
    a = jnp.broadcast_to(c_mont[:, None, None, :], (k, 4, ctx.L, ctx.L))
    b = jnp.broadcast_to(m16[None], (k, 4, ctx.L, ctx.L))
    return mont_mul(ctx, a, b)  # mont_mul(c*R, 2^(16l+4g)) = c * 2^(16l+4g) mod p


def _rows_to_bytes_T(ctx: FieldCtx, rows: jnp.ndarray) -> jnp.ndarray:
    """[k, 4, L, L] u32 row constants (nibble-group-major, see
    :func:`const_rows`) -> transposed byte-digit matrix D [2L, k*4L]:
    D[b, j] = byte_b of row j, with output rows grouped low-bytes-first
    (row b < L: low byte of limb b; row L+b: high byte).

    Group-major layouts keep the Pallas kernels free of sublane reshapes
    and strided slices (Mosaic miscompiles interleaved layouts); all
    reordering happens here, outside the kernel, in ordinary XLA.
    f32 carrier; kernels cast to bf16 on TPU.  XLA:CPU lacks bf16 dots, so
    interpret mode runs the same math in f32 (also exact)."""
    k = rows.shape[0]
    L = ctx.L
    flat = rows.reshape(k * 4 * L, L)  # j = t*4L + g*L + l
    lo = (flat & 0xFF).T  # [L, k4L]
    hi = ((flat >> 8) & 0xFF).T
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int32).astype(jnp.float32)


def _nibble_rows(at: jnp.ndarray) -> jnp.ndarray:
    """Limb-major strict limbs [L, B] u32 -> nibble digits [4L, B],
    nibble-group-major: row g*L + l = nibble g of limb l (concat only --
    no sublane reshape/interleave inside the kernel)."""
    return jnp.concatenate([(at >> s) & 0xF for s in (0, 4, 8, 12)], axis=0)


def _lincomb_epilogue(ctx: FieldCtx, use_bf16: bool, m_f32: jnp.ndarray, htabs_ref, comps: jnp.ndarray) -> jnp.ndarray:
    """Lazy byte coefficients [2L, B] f32 -> canonical strict limbs [L, B]
    u32 of the value mod p.  VPU + tiny one-hot matmuls.

    Caller contract: each coefficient < 2^23 (so the 16-bit repack stays
    below 2^32 - 2^16) and the total value < 2^16 * 2^(16L) (so the
    overflow fits one limb) -- both hold for digit matmuls of up to 2048
    nibble rows (the radix-32 DFT is the largest user)."""
    L = ctx.L
    mu = _f32_to_u32(m_f32)  # exact: integer values < 2^23
    B = mu.shape[1]
    # pack byte halves into 16-bit limb positions (group-major rows:
    # 0..L-1 = low bytes, L..2L-1 = high bytes; contiguous slices only)
    t = mu[:L] + (mu[L:] << 8)  # [L, B], < 2^32 - 2^16 (propagate-safe)
    strict = _propagate_rows(t, L + 1)  # value < 2^16 * 2^(16L)
    h = strict[L].astype(jnp.int32)  # [B], < 2^16
    lo = strict[:L]
    # correction: + (h * 2^(16L) mod p) via one one-hot matmul per h-nibble
    corr = jnp.zeros((L, B), jnp.uint32)
    for g in range(4):
        nib = ((h >> (4 * g)) & 0xF)[None, :]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (_HN, B), 0) == nib).astype(jnp.float32)
        cb = _f32_to_u32(_mm(use_bf16, htabs_ref[g], oh))  # [2L, B] bytes
        corr = corr + cb[:L] + (cb[L:] << 8)  # < 4 * 2^16
    v = _propagate_rows(lo + corr, L + 1)  # < 2^(16L) + 4p < 16p
    # conditional subtracts: 8p, 4p, 2p, p
    for row in range(4):
        W = L + 1
        d = _propagate_rows(v + _col(comps, row, W, v.ndim), W + 1)
        ge = d[W] != 0
        v = jnp.where(ge[None], d[:W], v)
    return v[:L]


def _mm(use_bf16: bool, d: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Digit matmul: products <= 15*255 and sums < 2^19 are exact in f32
    accumulation whether the operands ride the MXU as bf16 or stay f32."""
    if use_bf16:
        d = d.astype(jnp.bfloat16)
        a = a.astype(jnp.bfloat16)
    return jnp.dot(d, a, preferred_element_type=jnp.float32)


def _fold_mxu_kernel(ctx: FieldCtx, use_bf16, lo_ref, hi_ref, d_ref, htabs_ref, comps_ref, o_ref, s_ref):
    L = ctx.L
    lo = lo_ref[0].T  # [L, B]
    hi = hi_ref[0].T
    a = jnp.concatenate([_nibble_rows(lo), _nibble_rows(hi)], axis=0)  # [8L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    out = _lincomb_epilogue(ctx, use_bf16, m, htabs_ref, comps_ref[:])
    o_ref[0] = out.T

    # per-block lazy sum of the folded values (same contract as fold_pallas)
    s = jnp.sum(out.astype(jnp.int32), axis=1).astype(jnp.uint32)
    ss = _propagate_rows(s[:, None], L + 2)[:, 0]
    j = pl.program_id(1)
    s_ref[0, j] = ss


@functools.partial(jax.jit, static_argnums=(0, 3))
def fold_mxu_pallas(ctx: FieldCtx, flat: jnp.ndarray, r: jnp.ndarray, block: int = 2048):
    """Drop-in replacement for ``pallas_kernels.fold_pallas`` riding the MXU.

    flat [B, 2T, L] Montgomery; r [L] Montgomery challenge.  Returns
    (folded [B, T, L], per-block wide sums [B, T//block, L+2]).  The folded
    value is ``lo*(1-r) + hi*r mod p`` == ``lo + r*(hi-lo)`` -- bit-identical
    to the CIOS path (exact integers end to end).
    """
    B, N2, L = flat.shape
    T = N2 // 2
    nblocks = T // block
    m16_np, htabs_np, comps_np = _static_tables(ctx.name)

    one = ctx.one_mont
    from .arith import sub as mod_sub

    one_minus_r = mod_sub(ctx, one, r)
    rows = const_rows(ctx, jnp.stack([one_minus_r, r]))  # [2, 4, L, L]
    d = _rows_to_bytes_T(ctx, rows)  # [2L, 8L] f32

    on_tpu = jax.default_backend() == "tpu"
    return pl.pallas_call(
        functools.partial(_fold_mxu_kernel, ctx, on_tpu),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, L), jnp.uint32),
            jax.ShapeDtypeStruct((B, nblocks, L + 2), jnp.uint32),
        ),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, block, L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, L), lambda b, j, _n=nblocks: (b, j + _n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, 8 * L), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * L, _HN), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblocks, L + 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=not on_tpu,
    )(flat, flat, d, jnp.asarray(htabs_np), jnp.asarray(comps_np))


def _mul_mxu_kernel(ctx: FieldCtx, use_bf16, a_ref, d_ref, htabs_ref, comps_ref, o_ref):
    at = a_ref[:].T  # [L, B]
    a = _nibble_rows(at)  # [4L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    o_ref[:] = _lincomb_epilogue(ctx, use_bf16, m, htabs_ref, comps_ref[:]).T


@functools.partial(jax.jit, static_argnums=(0, 3))
def mul_const_mxu_pallas(ctx: FieldCtx, a: jnp.ndarray, c_mont: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """a [N, L] x one Montgomery scalar c [L] -> mont_mul(a, c), via the MXU.

    Bit-identical to ``arith.mont_mul(ctx, a, c)``; N % block == 0.
    """
    N, L = a.shape
    _, htabs_np, comps_np = _static_tables(ctx.name)
    rows = const_rows(ctx, c_mont[None])  # [1, 4, L, L]
    d = _rows_to_bytes_T(ctx, rows)  # [2L, 4L] f32
    on_tpu = jax.default_backend() == "tpu"
    return pl.pallas_call(
        functools.partial(_mul_mxu_kernel, ctx, on_tpu),
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * L, _HN), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=not on_tpu,
    )(a, d, jnp.asarray(htabs_np), jnp.asarray(comps_np))


# ---------------------------------------------------------------------------
# limb-major variants: table layout [L, N] in HBM
#
# The framework's default [N, L] layout puts the 16-limb axis on the 128-wide
# lane dimension: every VMEM tile is 7/8 padding and HBM DMA runs at ~28 GB/s
# of a measured ~165 GB/s ceiling (this chip).  Limb-major [L, N] blocks use
# every lane, need no in-kernel transpose, and the whole fused sumcheck can
# stay in this layout (one XLA transpose at proof entry).
# ---------------------------------------------------------------------------


def _fold_mxu_lm_kernel(ctx: FieldCtx, use_bf16, lo_ref, hi_ref, d_ref, htabs_ref, comps_ref, o_ref, s_ref):
    L = ctx.L
    lo = lo_ref[0]  # [L, B] already limb-major
    hi = hi_ref[0]
    a = jnp.concatenate([_nibble_rows(lo), _nibble_rows(hi)], axis=0)  # [8L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    out = _lincomb_epilogue(ctx, use_bf16, m, htabs_ref, comps_ref[:])
    o_ref[0] = out

    s = jnp.sum(out.astype(jnp.int32), axis=1).astype(jnp.uint32)
    ss = _propagate_rows(s[:, None], L + 2)[:, 0]
    j = pl.program_id(1)
    s_ref[0, j] = ss


@functools.partial(jax.jit, static_argnums=(0, 3))
def fold_mxu_lm(ctx: FieldCtx, lm: jnp.ndarray, r: jnp.ndarray, block: int = 2048):
    """Limb-major fused fold: lm [B, L, 2T] -> ([B, L, T], [B, T//block, L+2]).

    Same math and bit-identical results as :func:`fold_mxu_pallas`, with the
    element axis on lanes end to end (fast DMA, no transposes).
    """
    B, L, N2 = lm.shape
    T = N2 // 2
    nblocks = T // block
    _, htabs_np, comps_np = _static_tables(ctx.name)

    from .arith import sub as mod_sub

    one_minus_r = mod_sub(ctx, ctx.one_mont, r)
    rows = const_rows(ctx, jnp.stack([one_minus_r, r]))  # [2, 4, L, L]
    d = _rows_to_bytes_T(ctx, rows)  # [2L, 8L] f32

    on_tpu = jax.default_backend() == "tpu"
    return pl.pallas_call(
        functools.partial(_fold_mxu_lm_kernel, ctx, on_tpu),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, T), jnp.uint32),
            jax.ShapeDtypeStruct((B, nblocks, L + 2), jnp.uint32),
        ),
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec((1, L, block), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, block), lambda b, j, _n=nblocks: (b, 0, j + _n), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * L, 8 * L), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * L, _HN), lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L + 1), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, block), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblocks, L + 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=not on_tpu,
    )(lm, lm, d, jnp.asarray(htabs_np), jnp.asarray(comps_np))
