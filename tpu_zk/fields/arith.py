"""TPU-native prime-field arithmetic over packed 16-bit limbs.

Design
------
A field element is a vector of ``L`` little-endian 16-bit limbs stored in a
``uint32`` lane (``L = ceil(bits/16)`` rounded so that ``R = 2**(16*L) > 4p``).
Arrays of elements have shape ``[..., L]`` with the element axis leading, so
ordinary JAX sharding on the leading axes distributes the table across a
device mesh while the limb axis stays local.

All heavy ops (Montgomery multiply, folds, sums) are straight-line chains of
``uint32`` vector ops over the ``[..., L]`` arrays: XLA fuses them onto the
VPU, and the same code runs under CPU for tests.  16x16-bit limb products fit
a ``uint32`` exactly; accumulators stay "lazy" (un-carried) with headroom
bounded well below 2**32 (see the inline bounds), so no 64-bit arithmetic is
ever required -- the representation TPUs want.

Montgomery form is used throughout for device-resident data: ``mont(x) =
x * R mod p``.  Host <-> device boundaries (transcripts, serialization) convert
via exact Python-integer arithmetic.

Reference parity: this module replaces arkworks ``ark-ff`` (the L1 substrate
of the reference workspace -- see SURVEY.md section 1).  Serialization matches
``into_bigint().to_bytes_be()`` / ``from_le_bytes_mod_order`` semantics used by
the reference transcript (``transcripts/src/fiat_shamir/fiat_shamir_transcript.rs:38-43``).
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
        """Device array [..., L] -> python ints (canonical, non-Montgomery)."""
        a = np.asarray(jax.device_get(arr)).astype(np.uint64)
        flat = a.reshape(-1, self.L)
        shifts = np.uint64(LIMB_BITS) * np.arange(self.L, dtype=np.uint64)
        # build ints exactly with python arithmetic
        out = []
        for row in flat:
            x = 0
            for i in range(self.L):
                x |= int(row[i]) << (LIMB_BITS * i)
            out.append(self.from_mont_int(x) if mont else x % self.p)
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
# low-level limb chains (all pure jnp; [..., W] uint32 arrays)
# ---------------------------------------------------------------------------


def carry_propagate(t: jnp.ndarray, out_width: int | None = None) -> jnp.ndarray:
    """Lazy limbs (< 2^32 - 2^16 each) -> strict 16-bit limbs.

    Sequential carry chain over the limb axis; each step is one vector op over
    the element axes.
    """
    W = t.shape[-1]
    ow = out_width if out_width is not None else W + 1
    limbs = []
    carry = jnp.zeros(t.shape[:-1], jnp.uint32)
    for j in range(ow):
        s = (t[..., j] if j < W else jnp.zeros_like(carry)) + carry
        limbs.append(s & MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(limbs, axis=-1)


def _sub_chain(a: jnp.ndarray, b: jnp.ndarray):
    """Strict a - b with borrow; returns (diff, borrow) over [..., W]."""
    W = a.shape[-1]
    limbs = []
    borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
    for j in range(W):
        bj = b[..., j] if j < b.shape[-1] else jnp.zeros_like(borrow)
        s = a[..., j] + np.uint32(BASE) - bj - borrow
        limbs.append(s & MASK)
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    return jnp.stack(limbs, axis=-1), borrow


def cond_sub_p(ctx: FieldCtx, t: jnp.ndarray) -> jnp.ndarray:
    """If value >= p subtract p.  t: strict [..., W>=L] with value < 2p."""
    diff, borrow = _sub_chain(t, jnp.asarray(ctx.p_limbs))
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, t, diff)[..., : ctx.L]


@functools.partial(jax.jit, static_argnums=(0,))
def add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular add of strict canonical elements [..., L]."""
    counters.bump(ctx.name, "add", a, b)
    s = carry_propagate(a + b, ctx.L + 1)
    return cond_sub_p(ctx, s)


@functools.partial(jax.jit, static_argnums=(0,))
def sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Modular sub of strict canonical elements [..., L]."""
    counters.bump(ctx.name, "sub", a, b)
    diff, borrow = _sub_chain(a, b)
    plus_p = carry_propagate(diff + jnp.asarray(ctx.p_limbs), ctx.L)
    take_plus = (borrow != 0)[..., None]
    return jnp.where(take_plus, plus_p, diff)


@functools.partial(jax.jit, static_argnums=(0,))
def neg(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """p - a for a != 0, 0 for 0."""
    z = is_zero(ctx, a)[..., None]
    diff, _ = _sub_chain(jnp.broadcast_to(jnp.asarray(ctx.p_limbs), a.shape), a)
    return jnp.where(z, a, diff)


def is_zero(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


@functools.partial(jax.jit, static_argnums=(0,))
def mont_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p; CIOS with lazy carries.

    a, b: strict canonical [..., L].  Broadcasts over leading axes.

    Bounds: per iteration each accumulator slot gains at most
    ``4*(2^16-1) + carry`` and lives for <= L+1 iterations, so slots stay
    < 2^23 for L <= 24 -- far below the uint32 ceiling.  16x16 limb products
    are exact in uint32.
    """
    counters.bump(ctx.name, "mul", a, b)
    L = ctx.L
    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape[:-1]
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


@functools.partial(jax.jit, static_argnums=(0,))
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

    acc = jnp.concatenate(
        [t, jnp.zeros(shape + (B - W,), jnp.uint32)], -1
    )
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
    return redc_wide(ctx, a)


@functools.partial(jax.jit, static_argnums=(0, 2))
def sum_mod(ctx: FieldCtx, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Exact modular sum along ``axis`` of strict canonical elements.

    Strategy: chunked lazy uint32 sums (16-bit limbs allow 2^15-term chunks
    with headroom), then a second lazy pass, then one wide Montgomery
    reduction + scale-back.  Associativity of modular addition makes the
    reduction order irrelevant, so the same result is obtained regardless of
    sharding (SURVEY.md section 7 "hard parts" item 5).
    """
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
    plain = redc_wide(ctx, wide)  # == (sum) * R^-1 * R_in... undo with R2
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
