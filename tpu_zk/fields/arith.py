"""TPU-native prime-field arithmetic over packed 16-bit limbs.

Design
------
A field element is a vector of ``L`` little-endian 16-bit limbs stored in a
``uint32`` lane (``L = ceil(bits/16)``; ``R = 2**(16*L) > p``).  Arrays of
elements have shape ``[..., L]`` with element axes leading, so ordinary JAX
sharding on the leading axes distributes tables across a device mesh while
the limb axis stays local.

All heavy ops (Montgomery multiply, folds, sums) are chains of ``uint32``
vector ops over whole ``[..., L]`` arrays: XLA fuses them onto the VPU, and
the same code runs on CPU for tests.  16x16-bit limb products are exact in
uint32; accumulators stay "lazy" (un-carried) with bounded headroom, and
carry propagation is two halving passes plus a log-depth Kogge-Stone
carry-lookahead -- array-wide ops only, no per-limb slicing, which keeps both
XLA graphs small and the VPU busy.

Montgomery form is used for all device-resident data: ``mont(x) = x*R mod p``.
Host <-> device boundaries (transcripts, serialization) convert via exact
Python-integer arithmetic.

Reference parity: this module replaces arkworks ``ark-ff`` (L1 substrate of
the reference workspace -- SURVEY.md section 1).  Serialization matches
``into_bigint().to_bytes_be()`` / ``from_le_bytes_mod_order`` semantics used
by the reference transcript (``transcripts/src/fiat_shamir/fiat_shamir_transcript.rs:38-43``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .primes import PRIMES, SERIALIZED_BYTES
from ..utils import counters

LIMB_BITS = 16
MASK = np.uint32(0xFFFF)
BASE = 1 << LIMB_BITS


def _limbs_of_int(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


def _int_of_limbs(limbs) -> int:
    x = 0
    for i, v in enumerate(np.asarray(limbs).tolist()):
        x |= int(v) << (LIMB_BITS * i)
    return x


@dataclass(frozen=True, eq=False)
class FieldCtx:
    """Static parameters of a prime field in limb representation.

    Hashable/comparable by name so it can be a jit static argument.
    """

    name: str
    p: int
    L: int
    nbytes: int  # serialized (arkworks bigint) byte width
    p_limbs: np.ndarray = field(repr=False)
    n0inv: int = 0  # -p^{-1} mod 2^16
    R: int = 0  # 2^(16L) mod p
    R2: int = 0  # R^2 mod p
    Rinv: int = 0

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, FieldCtx) and self.name == other.name

    # -- host-side helpers ---------------------------------------------------
    def to_limbs(self, x: int) -> np.ndarray:
        return _limbs_of_int(x % self.p, self.L)

    def from_limbs(self, limbs) -> int:
        return _int_of_limbs(limbs)

    def to_mont_int(self, x: int) -> int:
        return (x % self.p) * self.R % self.p

    def from_mont_int(self, x: int) -> int:
        return x * self.Rinv % self.p

    def array(self, values, mont: bool = True) -> jnp.ndarray:
        """Host ints -> device array [N, L] (Montgomery form by default)."""
        vals = [self.to_mont_int(v) if mont else (v % self.p) for v in values]
        out = np.stack([_limbs_of_int(v, self.L) for v in vals]) if vals else np.zeros((0, self.L), np.uint32)
        return jnp.asarray(out, dtype=jnp.uint32)

    def scalar(self, value: int, mont: bool = True) -> jnp.ndarray:
        """Host int -> device element [L]."""
        v = self.to_mont_int(value) if mont else (value % self.p)
        return jnp.asarray(_limbs_of_int(v, self.L), dtype=jnp.uint32)

    def to_ints(self, arr, mont: bool = True):
        """Device array [..., L] -> python ints (canonical, non-Montgomery).

        Vectorized: one BE-bytes view of the whole array, then one
        ``int.from_bytes`` per element (the per-limb Python loop this
        replaces was the FRI query phase's bottleneck).
        """
        a = np.asarray(jax.device_get(arr)).reshape(-1, self.L)
        buf = a[:, ::-1].astype(">u2").tobytes()
        per = self.L * 2
        if mont:
            rinv, p = self.Rinv, self.p
            out = [
                int.from_bytes(buf[i : i + per], "big") * rinv % p
                for i in range(0, len(buf), per)
            ]
        else:
            p = self.p
            out = [
                int.from_bytes(buf[i : i + per], "big") % p
                for i in range(0, len(buf), per)
            ]
        if arr.ndim == 1:
            return out[0]
        return out

    # -- serialization (transcript parity) ----------------------------------
    def to_bytes_be(self, x: int) -> bytes:
        """arkworks ``into_bigint().to_bytes_be()`` equivalent."""
        return int(x % self.p).to_bytes(self.nbytes, "big")

    def to_bytes_le(self, x: int) -> bytes:
        return int(x % self.p).to_bytes(self.nbytes, "little")

    def from_le_bytes_mod_order(self, b: bytes) -> int:
        return int.from_bytes(b, "little") % self.p

    @property
    def zero(self) -> jnp.ndarray:
        return jnp.zeros((self.L,), jnp.uint32)

    @property
    def one_mont(self) -> jnp.ndarray:
        return self.scalar(1)


@functools.lru_cache(maxsize=None)
def field_ctx(name: str) -> FieldCtx:
    p = PRIMES[name]
    bits = p.bit_length()
    # R = 2^(16L) > p suffices for a single conditional subtract in CIOS as
    # long as inputs stay canonical (< p): result < (p^2 + R*p)/R < 2p.
    L = (bits + LIMB_BITS - 1) // LIMB_BITS
    assert 2 * p < (1 << (LIMB_BITS * L)), "sub/cond_sub assume 2p < B^L"
    R = (1 << (LIMB_BITS * L)) % p
    n0inv = (-pow(p, -1, BASE)) % BASE
    return FieldCtx(
        name=name,
        p=p,
        L=L,
        nbytes=SERIALIZED_BYTES[name],
        p_limbs=_limbs_of_int(p, L),
        n0inv=n0inv,
        R=R,
        R2=R * R % p,
        Rinv=pow(R, -1, p),
    )


# ---------------------------------------------------------------------------
# low-level limb machinery (array-wide ops over [..., W] uint32)
# ---------------------------------------------------------------------------


def _shift_limbs_up(x: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """Multiply by B^k within fixed width (drops top limbs; caller guarantees
    they are zero / irrelevant)."""
    if k == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def carry_propagate(t: jnp.ndarray, out_width: int | None = None) -> jnp.ndarray:
    """Lazy limbs (each < 2^32 - 2^16, value < B^out_width) -> strict limbs.

    Two halving passes bring every limb to <= 2^16, then a Kogge-Stone
    carry-lookahead resolves the remaining single-bit carries in log2(W)
    array-wide steps.
    """
    W = t.shape[-1]
    ow = out_width if out_width is not None else W + 1
    if ow > W:
        t = jnp.concatenate([t, jnp.zeros(t.shape[:-1] + (ow - W,), jnp.uint32)], -1)
    for _ in range(2):
        t = (t & MASK) + _shift_limbs_up(t >> LIMB_BITS)
    # limbs now <= 2^16; single-bit carries remain
    g = (t >> LIMB_BITS).astype(jnp.uint32)  # 1 iff limb == 2^16
    r = t & MASK
    p = (r == MASK).astype(jnp.uint32)
    d = 1
    while d < ow:
        g = g | (p & _shift_limbs_up(g, d))
        p = p & _shift_limbs_up(p, d)
        d *= 2
    c_in = _shift_limbs_up(g, 1)
    return (r + c_in) & MASK


@functools.lru_cache(maxsize=None)
def _comp_limbs(p: int, W: int) -> np.ndarray:
    """B^W - p as W strict limbs (two's-complement constant)."""
    return _limbs_of_int((1 << (LIMB_BITS * W)) - p, W)


def cond_sub_p(ctx: FieldCtx, t: jnp.ndarray) -> jnp.ndarray:
    """If value >= p subtract p.  t: strict [..., W >= L] with value < 2p.
    Returns canonical [..., L]."""
    W = t.shape[-1]
    comp = jnp.asarray(_comp_limbs(ctx.p, W))
    d = carry_propagate(t + comp, W + 1)  # t - p + B^W
    ge = (d[..., W] != 0)[..., None]  # overflow bit <=> t >= p
    return jnp.where(ge, d[..., :W], t)[..., : ctx.L]


def _addsub_tpu_path(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray, kind: str):
    """Route large elementwise add/sub through the Pallas kernel (one HBM
    pass; the XLA carry-propagation graph costs ~2.5x a Montgomery mul)."""
    import math

    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape[:-1]
    M = math.prod(shape) if shape else 1
    if jax.default_backend() != "tpu" or M < 2048:
        return None
    from .pallas_kernels import addsub_pallas

    block = 1024
    L = ctx.L
    flat_a = a.reshape(M, L)
    flat_b = b.reshape(M, L)
    pad = (-M) % block
    if pad:
        flat_a = jnp.concatenate([flat_a, jnp.zeros((pad, L), jnp.uint32)])
        flat_b = jnp.concatenate([flat_b, jnp.zeros((pad, L), jnp.uint32)])
    out = addsub_pallas(ctx, flat_a, flat_b, kind, block)
    return out[:M].reshape(a.shape)


def add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular add of canonical elements [..., L]."""
    counters.bump(ctx.name, "add", a, b)
    fast = _addsub_tpu_path(ctx, a, b, "add")
    if fast is not None:
        return fast
    s = carry_propagate(a + b, ctx.L + 1)
    return cond_sub_p(ctx, s)


def sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular sub of canonical elements [..., L]: a - b + p, then reduce."""
    counters.bump(ctx.name, "sub", a, b)
    fast = _addsub_tpu_path(ctx, a, b, "sub")
    if fast is not None:
        return fast
    comp_b = MASK - b  # + 1 at limb 0 completes B^L - b
    t = a + jnp.asarray(ctx.p_limbs) + comp_b
    t = t.at[..., 0].add(1)
    # value = (a - b + p) + B^L with a-b+p in [1, 2p) and 2p < B^L; the
    # B^L bit lands in limb L, so the low L limbs are exactly a - b + p
    s = carry_propagate(t, ctx.L + 1)
    return cond_sub_p(ctx, s[..., : ctx.L])


def neg(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """p - a for a != 0, 0 for 0."""
    z = is_zero(ctx, a)[..., None]
    comp_a = MASK - a
    t = jnp.asarray(ctx.p_limbs) + comp_a
    t = t.at[..., 0].add(1)
    s = carry_propagate(t, ctx.L + 1)  # p - a + B^L; bit L always set
    return jnp.where(z, a, s[..., : ctx.L])


def is_zero(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def mont_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p; CIOS with lazy carries.

    a, b: canonical [..., L]; broadcasts over leading axes.  The limb loop is
    a lax.fori_loop whose body is ~10 array-wide ops; accumulator slots stay
    < 2^23 (4 * 2^16 growth per iteration over <= L+1 live iterations).
    """
    counters.bump(ctx.name, "mul", a, b)
    L = ctx.L
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape[:-1]

    # TPU hot path: VMEM-resident Pallas kernel (~10x the XLA-graph loop,
    # which spills every loop intermediate to HBM)
    import math

    M = math.prod(shape) if shape else 1
    if jax.default_backend() == "tpu" and M >= 2048:
        from .pallas_kernels import mont_mul_pallas

        block = 1024
        flat_a = a.reshape(M, L)
        flat_b = b.reshape(M, L)
        pad = (-M) % block
        if pad:
            flat_a = jnp.concatenate([flat_a, jnp.zeros((pad, L), jnp.uint32)])
            flat_b = jnp.concatenate([flat_b, jnp.zeros((pad, L), jnp.uint32)])
        out = mont_mul_pallas(ctx, flat_a, flat_b, block)
        return out[:M].reshape(a.shape)

    n = jnp.asarray(ctx.p_limbs)
    n0inv = np.uint32(ctx.n0inv)
    zero2 = jnp.zeros(shape + (2,), jnp.uint32)
    zero1 = jnp.zeros(shape + (1,), jnp.uint32)

    def body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=a.ndim - 1, keepdims=True)
        p_full = ai * b  # exact in uint32 (16x16-bit limbs)
        t = t + jnp.concatenate([p_full & MASK, zero2], -1)
        t = t + jnp.concatenate([zero1, p_full >> LIMB_BITS, zero1], -1)
        m = (t[..., :1] * n0inv) & MASK
        q_full = m * n
        t = t + jnp.concatenate([q_full & MASK, zero2], -1)
        t = t + jnp.concatenate([zero1, q_full >> LIMB_BITS, zero1], -1)
        carry = t[..., :1] >> LIMB_BITS  # t[0] == 0 mod 2^16 by construction
        t = jnp.concatenate([t[..., 1:], zero1], -1)
        return t.at[..., :1].add(carry)

    t = jax.lax.fori_loop(0, L, body, jnp.zeros(shape + (L + 2,), jnp.uint32))
    strict = carry_propagate(t[..., : L + 1], L + 1)
    return cond_sub_p(ctx, strict)


def mont_sqr(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def redc_wide(ctx: FieldCtx, t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-reduce a strict wide value: returns value * R^-1 mod p.

    t: strict limbs [..., W] with L <= W and value < R*p.
    """
    L = ctx.L
    W = t.shape[-1]
    B = max(W, L + 1) + 1
    shape = t.shape[:-1]
    n = jnp.asarray(ctx.p_limbs)
    n0inv = np.uint32(ctx.n0inv)

    acc = jnp.concatenate([t, jnp.zeros(shape + (B - W,), jnp.uint32)], -1)
    zero1 = jnp.zeros(shape + (1,), jnp.uint32)
    pad_hi = jnp.zeros(shape + (B - L - 1,), jnp.uint32)
    pad_lo = jnp.zeros(shape + (B - L,), jnp.uint32)

    def body(_, acc):
        m = (acc[..., :1] * n0inv) & MASK
        q_full = m * n
        acc = acc + jnp.concatenate([q_full & MASK, pad_lo], -1)
        acc = acc + jnp.concatenate([zero1, q_full >> LIMB_BITS, pad_hi], -1)
        carry = acc[..., :1] >> LIMB_BITS
        acc = jnp.concatenate([acc[..., 1:], zero1], -1)
        return acc.at[..., :1].add(carry)

    acc = jax.lax.fori_loop(0, L, body, acc)
    strict = carry_propagate(acc[..., : L + 1], L + 1)
    return cond_sub_p(ctx, strict)


def to_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, jnp.asarray(_limbs_of_int(ctx.R2, ctx.L)))


def from_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    import math

    M = math.prod(a.shape[:-1]) if a.ndim > 1 else 1
    if jax.default_backend() == "tpu" and M >= 2048:
        # a * 1 * R^-1 = plain form; routes through the Pallas kernel
        one_plain = jnp.zeros((ctx.L,), jnp.uint32).at[0].set(1)
        return mont_mul(ctx, a, one_plain)
    return redc_wide(ctx, a)


def sum_mod(ctx: FieldCtx, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Exact modular sum along ``axis`` of canonical elements.

    Chunked lazy uint32 sums (16-bit limbs allow 2^15-term chunks), then one
    wide Montgomery reduction + scale-back.  Modular addition is associative,
    so the reduction order -- and hence any sharding -- cannot change the
    result (SURVEY.md section 7 hard-part 5)."""
    counters.bump(ctx.name, "add", a)
    if axis < 0:
        axis += a.ndim
    a = jnp.moveaxis(a, axis, 0)
    N = a.shape[0]
    CH = 1 << 15
    if N > CH:
        pad = (-N) % CH
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], jnp.uint32)], 0)
        a = a.reshape(-1, CH, *a.shape[1:])
        lazy1 = jnp.sum(a, axis=1, dtype=jnp.uint32)  # limbs < 2^31
        strict1 = carry_propagate(lazy1, ctx.L + 2)  # [K, ..., L+2]
        lazy2 = jnp.sum(strict1, axis=0, dtype=jnp.uint32)  # K <= 2^16 -> < 2^32
        wide = carry_propagate(lazy2, ctx.L + 4)
    else:
        lazy = jnp.sum(a, axis=0, dtype=jnp.uint32)  # limbs < 2^31
        wide = carry_propagate(lazy, ctx.L + 2)
    plain = redc_wide(ctx, wide)  # (sum)*R * R^-1 = sum, plain form
    return mont_mul(ctx, plain, jnp.asarray(_limbs_of_int(ctx.R2, ctx.L)))


def reduce_wide_to_mont(ctx: FieldCtx, wide: jnp.ndarray) -> jnp.ndarray:
    """Strict wide limbs [..., W] holding a sum of Montgomery residues
    (value < R*p) -> canonical Montgomery element [..., L]."""
    plain = redc_wide(ctx, wide)  # (sum)*R * R^-1 = sum, plain form
    return mont_mul(ctx, plain, jnp.asarray(_limbs_of_int(ctx.R2, ctx.L)))


def scalar_mul(ctx: FieldCtx, a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """a[..., L] * scalar s[L] (both Montgomery)."""
    return mont_mul(ctx, a, s)


def inv_host(ctx: FieldCtx, x: int) -> int:
    return pow(x, ctx.p - 2, ctx.p)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_mont(ctx: FieldCtx, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e (Montgomery in/out); lax.scan over exponent bits keeps the graph
    one multiply wide regardless of exponent size."""
    one = jnp.broadcast_to(ctx.one_mont, a.shape)
    if e == 0:
        return one
    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], jnp.uint32)

    def body(carry, bit):
        result, base = carry
        mul = mont_mul(ctx, result, base)
        result = jnp.where(bit == 1, mul, result)
        base = mont_mul(ctx, base, base)
        return (result, base), None

    (result, _), _ = jax.lax.scan(body, (one, a), bits)
    return result


def inv_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Batched modular inverse via Fermat (device); a in Montgomery form."""
    return pow_mont(ctx, a, ctx.p - 2)


# jit wrappers for the public ops (ctx static; shapes cached per call site)
add = functools.partial(jax.jit, static_argnums=(0,))(add)
sub = functools.partial(jax.jit, static_argnums=(0,))(sub)
neg = functools.partial(jax.jit, static_argnums=(0,))(neg)
mont_mul = functools.partial(jax.jit, static_argnums=(0,))(mont_mul)
redc_wide = functools.partial(jax.jit, static_argnums=(0,))(redc_wide)
sum_mod = functools.partial(jax.jit, static_argnums=(0, 2))(sum_mod)
