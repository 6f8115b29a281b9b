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
# nibbles: corr = sum_g nib_g(h) * (2^(16L+4g) mod p) -- plain u32 broadcast
# multiplies (products < 2^20, exact), no gathers or one-hot dots, so the
# epilogue also works on rank-3 blocks (the DFT kernel's [L, m, bb])


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

    # epilogue constants, one [11, L+1] array: rows 0..6 are the
    # conditional-subtract values B^(L+1) - k*p for k = 64..1 (the corrected
    # value is < 2^(16L) + 60p < 128p for every supported field); rows 7..10
    # are the overflow-nibble row constants E_g = 2^(16L+4g) mod p.
    W = L + 1
    BW = 1 << (LIMB_BITS * W)
    assert (1 << (LIMB_BITS * L)) + 60 * p < 128 * p
    epi = np.zeros((11, W), np.uint32)
    for i, k in enumerate((64, 32, 16, 8, 4, 2, 1)):
        epi[i] = _limbs_of_int(BW - k * p, W)
    for g in range(4):
        epi[7 + g, :L] = _limbs_of_int((1 << (4 * g)) * R % p, L)
    return m16, epi


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


def _lincomb_epilogue(ctx: FieldCtx, m_f32: jnp.ndarray, epi: jnp.ndarray) -> jnp.ndarray:
    """Lazy byte coefficients [2L, ...] f32 -> canonical strict limbs
    [L, ...] u32 of the value mod p.  Pure VPU (rank-agnostic).

    Caller contract: each coefficient < 2^23 (so the 16-bit repack stays
    below 2^32 - 2^16) and the total value < 2^16 * 2^(16L) (so the
    overflow fits one limb) -- both hold for digit matmuls of up to 2048
    nibble rows (the radix-32 DFT is the largest user).

    epi: the [11, L+1(, 1)] constant block from ``_static_tables`` (seven
    cond-sub rows + four overflow-nibble rows E_g = 2^(16L+4g) mod p)."""
    L = ctx.L
    mu = _f32_to_u32(m_f32)  # exact: integer values < 2^23
    # pack byte halves into 16-bit limb positions (group-major rows:
    # 0..L-1 = low bytes, L..2L-1 = high bytes; contiguous slices only)
    t = mu[:L] + (mu[L:] << 8)  # < 2^32 - 2^16 (propagate-safe)
    strict = _propagate_rows(t, L + 1)  # value < 2^16 * 2^(16L)
    h = strict[L]  # [...], < 2^16
    lo = strict[:L]
    # correction: + (h * 2^(16L) mod p) = sum_g nib_g(h) * E_g, with every
    # product nib * E_g_limb < 2^20 exact in u32; corr value < 60p
    corr = jnp.zeros_like(lo)
    for g in range(4):
        nib = ((h >> (4 * g)) & 0xF)[None]
        corr = corr + nib * _col(epi, 7 + g, L, lo.ndim)
    v = _propagate_rows(lo + corr, L + 1)  # < 2^(16L) + 60p < 128p
    # conditional subtracts: 64p, 32p, ..., p
    for row in range(7):
        W = L + 1
        d = _propagate_rows(v + _col(epi, row, W, v.ndim), W + 1)
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


def _fold_mxu_kernel(ctx: FieldCtx, use_bf16, lo_ref, hi_ref, d_ref, epi_ref, o_ref, s_ref):
    L = ctx.L
    lo = lo_ref[0].T  # [L, B]
    hi = hi_ref[0].T
    a = jnp.concatenate([_nibble_rows(lo), _nibble_rows(hi)], axis=0)  # [8L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    out = _lincomb_epilogue(ctx, m, epi_ref[:])
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
    assert N2 % 2 == 0 and T % block == 0, (
        f"fold_mxu_pallas: half-table {T} must be a multiple of block {block} "
        "(the grid would silently drop the tail)"
    )
    nblocks = T // block
    m16_np, epi_np = _static_tables(ctx.name)

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
            pl.BlockSpec((11, L + 1), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, L), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblocks, L + 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=not on_tpu,
    )(flat, flat, d, jnp.asarray(epi_np))


def _mul_mxu_kernel(ctx: FieldCtx, use_bf16, a_ref, d_ref, epi_ref, o_ref):
    at = a_ref[:].T  # [L, B]
    a = _nibble_rows(at)  # [4L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    o_ref[:] = _lincomb_epilogue(ctx, m, epi_ref[:]).T


@functools.partial(jax.jit, static_argnums=(0, 3))
def mul_const_mxu_pallas(ctx: FieldCtx, a: jnp.ndarray, c_mont: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """a [N, L] x one Montgomery scalar c [L] -> mont_mul(a, c), via the MXU.

    Bit-identical to ``arith.mont_mul(ctx, a, c)``; N % block == 0.
    """
    N, L = a.shape
    assert N % block == 0, (
        f"mul_const_mxu_pallas: N={N} must be a multiple of block {block} "
        "(the grid would silently drop the tail)"
    )
    _, epi_np = _static_tables(ctx.name)
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
            pl.BlockSpec((11, L + 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=not on_tpu,
    )(a, d, jnp.asarray(epi_np))


# ---------------------------------------------------------------------------
# limb-major variants: table layout [L, N] in HBM
#
# The framework's default [N, L] layout puts the 16-limb axis on the 128-wide
# lane dimension: every VMEM tile is 7/8 padding and HBM DMA runs at ~28 GB/s
# of a measured ~165 GB/s ceiling (this chip).  Limb-major [L, N] blocks use
# every lane, need no in-kernel transpose, and the whole fused sumcheck can
# stay in this layout (one XLA transpose at proof entry).
# ---------------------------------------------------------------------------


def _fold_mxu_lm_kernel(ctx: FieldCtx, use_bf16, lo_ref, hi_ref, d_ref, epi_ref, o_ref, s_ref):
    L = ctx.L
    lo = lo_ref[0]  # [L, B] already limb-major
    hi = hi_ref[0]
    a = jnp.concatenate([_nibble_rows(lo), _nibble_rows(hi)], axis=0)  # [8L, B]
    m = _mm(use_bf16, d_ref[:], _to_f32(a))
    out = _lincomb_epilogue(ctx, m, epi_ref[:])
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
    assert N2 % 2 == 0 and T % block == 0, (
        f"fold_mxu_lm: half-table {T} must be a multiple of block {block} "
        "(the grid would silently drop the tail)"
    )
    nblocks = T // block
    _, epi_np = _static_tables(ctx.name)

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
            pl.BlockSpec((11, L + 1), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, block), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nblocks, L + 2), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=not on_tpu,
    )(lm, lm, d, jnp.asarray(epi_np))


# ---------------------------------------------------------------------------
# radix-m DFT pass on the MXU (the NTT building block)
#
# A full m-point NTT column is ALSO a linear map over the inputs' limb
# digits: out[k] = sum_n x[n] * w^(nk), so one [m*2L, m*4L] x [m*4L, bb]
# bf16 matmul transforms bb lanes of m elements at once -- twiddle
# multiplies, butterflies, and modular reduction all ride the systolic
# array.  m <= 32 keeps every f32 accumulator < 15*255*(32*4L) = 2^22.9
# (exact) and the value < 2048*15*p < 2^16 * 2^(16L) (epilogue contract).
# Replaces the stage-at-a-time Gentleman-Sande sweep of ntt/sixstep.py;
# the output digit order is bit-reversed to match the DIF convention.
# ---------------------------------------------------------------------------


def dft_matrix(ctx: FieldCtx, w_m: int, m: int, scale: int = 1) -> np.ndarray:
    """Host-built digit matrix D [2L*m, m*4L] f32 for one radix-m DFT.

    Row (b*m + jr): byte b of output digit jr, byte-position-major so the
    kernel reshapes the matmul output [2L*m, bb] -> [2L, m, bb] with one
    leading-dim split (sublane-safe) and runs ONE rank-3 epilogue.  Output
    digits jr enumerate k in BIT-REVERSED order, matching the DIF sweep.
    Column (n*4L + g*L + l) = operand x[n]'s nibble (g, l).
    Entry = byte_b(scale * w^(n*rev(j)) * 2^(16l+4g) mod p); ``scale``
    folds the inverse transform's 1/N into the matrix for free."""
    L = ctx.L
    p = ctx.p
    S = m.bit_length() - 1
    rev = [int(f"{j:0{S}b}"[::-1], 2) if S else 0 for j in range(m)]
    shifts = [pow(2, 16 * l + 4 * g, p) for g in range(4) for l in range(L)]
    nb = 2 * L
    # V[j, n, gl, b] = byte b (LE) of scale * w^(n*rev(j)) * 2^(16l+4g) mod p
    V = np.zeros((m, m, 4 * L, nb), np.uint8)
    for j in range(m):
        k = rev[j]
        w_nk = 1
        w_step = pow(w_m, k, p)
        for n in range(m):
            base = scale * w_nk % p
            for gl, sh in enumerate(shifts):
                V[j, n, gl] = np.frombuffer((base * sh % p).to_bytes(nb, "little"), np.uint8)
            w_nk = w_nk * w_step % p
    # group LE bytes: rows 0..L-1 = low byte of limb, L..2L-1 = high byte
    V = np.concatenate([V[..., 0::2], V[..., 1::2]], axis=-1)
    # rows (b, j), cols (n, g, l)
    return np.ascontiguousarray(
        V.transpose(3, 0, 1, 2).reshape(nb * m, m * 4 * L)
    ).astype(np.float32)


def _dft_mxu_kernel(ctx: FieldCtx, use_bf16, m: int, pre: bool, x_ref, d_ref, pre_ref, cios_ref, epi_ref, o_ref):
    """x_ref [L, m, bb]: optional pre-twiddle multiply (limb-major CIOS on
    the VPU), then the DFT digit matmul + one rank-3 epilogue."""
    from .pallas_kernels import _mont_mul_rows

    L = ctx.L
    t = x_ref[:]
    if pre:
        t = _mont_mul_rows(ctx, t, pre_ref[:], cios_ref[:])
    # digits: rows (n, g, l) -> concat over n of nibble rows
    a = jnp.concatenate([_nibble_rows(t[:, n, :]) for n in range(m)], axis=0)  # [m4L, bb]
    mm = _mm(use_bf16, d_ref[:], _to_f32(a))  # [2L*m, bb]
    mm3 = mm.reshape(2 * L, m, mm.shape[-1])  # leading split: rows (b, j)
    o_ref[:] = _lincomb_epilogue(ctx, mm3, epi_ref[:])  # [L, m, bb]


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def dft_mxu(ctx: FieldCtx, x: jnp.ndarray, d: jnp.ndarray, m: int, bb: int,
            pre: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched radix-m DFT over axis 1: x [L, m, B] -> [L, m, B] (digit
    bit-reversed, DIF convention), optionally pre-multiplied elementwise by
    ``pre [L, m, B]`` (the six-step inter-factor twiddles).  B % bb == 0."""
    from .pallas_kernels import _consts_for

    L, m_, B = x.shape
    assert m_ == m and B % bb == 0, (
        f"dft_mxu: batch {B} must be a multiple of block {bb} and the radix "
        f"axis {m_} must equal m={m} (the grid would silently drop the tail)"
    )
    m16_np, epi_np = _static_tables(ctx.name)
    epi3 = jnp.asarray(epi_np)[:, :, None]  # rank-3 _col layout
    cios3 = jnp.asarray(_consts_for(ctx.name))[:, :, None]
    on_tpu = jax.default_backend() == "tpu"
    col_spec = pl.BlockSpec((L, m, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    in_specs = [
        col_spec,
        pl.BlockSpec(d.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        col_spec if pre is not None else pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(cios3.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(epi3.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    pre_arg = pre if pre is not None else jnp.zeros((1, 1, 1), jnp.uint32)
    if on_tpu:
        d = d.astype(jnp.bfloat16)  # halves the VMEM block; _mm cast is a no-op
    return pl.pallas_call(
        functools.partial(_dft_mxu_kernel, ctx, on_tpu, m, pre is not None),
        out_shape=jax.ShapeDtypeStruct((L, m, B), jnp.uint32),
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=col_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not on_tpu,
    )(x, d, pre_arg, cios3, epi3)
