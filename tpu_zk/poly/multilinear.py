"""Multilinear polynomials in evaluation (boolean-hypercube) form, on device.

The table of ``2^n`` evaluations lives as a ``[..., N, L]`` uint32 limb array
(Montgomery form).  The core op is the partial-evaluation *fold*
``y1 + r*(y2 - y1)`` over pairs at stride ``2^(n-1-var)`` -- semantics match
the reference's index walk (``polynomials/src/multilinear/evaluation_form.rs:61-106``)
expressed as a reshape + vectorized lerp, which XLA fuses into one pass.

Reference API parity (evaluation_form.rs):
  new :12, evaluate :21, convert_to_bytes :35, number_of_variables :45,
  scalar_mul :49, partial_evaluate :61, polynomial_tensor_add/_mul :108-143,
  add_polynomials :145.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx


def _fold_pallas_dispatch(
    ctx: FieldCtx, table: jnp.ndarray, var: int, r: jnp.ndarray, need_sums: bool = False
):
    """TPU fast path: fused fold (+ folded half-sums) in one Pallas kernel.

    Reduces any ``var`` to var=0 by treating the 2^var leading index bits as
    batch rows.  Returns (folded [..., N/2, L], wide_sums [B, 2, L+2]) or
    None when shapes don't fit the kernel (small tables, CPU backend)."""
    import math

    if jax.default_backend() != "tpu":
        return None
    *batch, N, L = table.shape
    lead = 1 << var
    trail = N >> (var + 1)
    B = math.prod(batch) * lead if (batch or lead > 1) else 1
    # half-sums need >= 2 grid blocks per row (one per output half)
    block = min(1024, trail // 2 if need_sums else trail)
    if trail < 256 or B * trail < 2048:
        return None
    from ..fields.pallas_kernels import fold_pallas

    flat = table.reshape(B, 2 * trail, L)
    folded, sums = fold_pallas(ctx, flat, r, block)
    return folded.reshape(*batch, N // 2, L), sums


@functools.partial(jax.jit, static_argnums=(0, 2))
def fold(ctx: FieldCtx, table: jnp.ndarray, var: int, r: jnp.ndarray) -> jnp.ndarray:
    """Partially evaluate variable ``var`` at Montgomery scalar ``r [L]``.

    table: [..., N, L] -> [..., N/2, L].  Variable 0 is the most-significant
    index bit (pairs are the two halves of the table), as in the reference.
    """
    fast = _fold_pallas_dispatch(ctx, table, var, r)
    if fast is not None:
        return fast[0]
    *batch, N, L = table.shape
    lead = 1 << var
    trail = N >> (var + 1)
    t = table.reshape(*batch, lead, 2, trail, L)
    lo = t[..., 0, :, :]
    hi = t[..., 1, :, :]
    out = arith.add(ctx, lo, arith.mont_mul(ctx, arith.sub(ctx, hi, lo), r))
    return out.reshape(*batch, N // 2, L)


@functools.partial(jax.jit, static_argnums=(0,))
def fold_and_half_sums(ctx: FieldCtx, table: jnp.ndarray, r: jnp.ndarray):
    """One basic-sumcheck round, fully fused: fold variable 0, and return the
    Montgomery half-sums of the *folded* table (the next round univariate).

    table: [N, L] -> (folded [N/2, L], univ_mont [2, L]).
    """
    fast = _fold_pallas_dispatch(ctx, table, 0, r, need_sums=True)
    if fast is not None:
        folded, wide = fast  # wide: [1, G, L+2] strict per-block sums
        G = wide.shape[1]
        lazy = jnp.sum(wide[0].reshape(2, G // 2, ctx.L + 2), axis=1, dtype=jnp.uint32)
        strict = arith.carry_propagate(lazy, ctx.L + 4)
        return folded, arith.reduce_wide_to_mont(ctx, strict)
    folded = fold(ctx, table, 0, r)
    return folded, sum_halves(ctx, folded)


@functools.partial(jax.jit, static_argnums=(0,))
def fold_and_half_sums_lm(ctx: FieldCtx, lm: jnp.ndarray, r: jnp.ndarray):
    """Limb-major sumcheck round: lm [L, N] -> (folded [L, N/2], univ [2, L]).

    The [N, L] layout puts the limb axis on the 128-lane dimension (7/8 of
    every VMEM tile wasted; HBM DMA at ~1/6 of the measured ceiling), so the
    fused provers keep tables limb-major and ride the MXU fold kernel
    (``fields/mxu_mul.py``); results are bit-identical to
    :func:`fold_and_half_sums` (asserted in tests/test_fields.py).
    """
    L, N = lm.shape
    T = N // 2
    if jax.default_backend() == "tpu" and T >= 256:
        from ..fields.mxu_mul import fold_mxu_lm

        block = min(8192, T // 2)
        folded, wide = fold_mxu_lm(ctx, lm[None], r, block)
        G = wide.shape[1]
        lazy = jnp.sum(wide[0].reshape(2, G // 2, ctx.L + 2), axis=1, dtype=jnp.uint32)
        strict = arith.carry_propagate(lazy, ctx.L + 4)
        return folded[0], arith.reduce_wide_to_mont(ctx, strict)
    folded_mm, univ = fold_and_half_sums(ctx, lm.T, r)
    return folded_mm.T, univ


@functools.partial(jax.jit, static_argnums=(0,))
def sum_halves(ctx: FieldCtx, table: jnp.ndarray) -> jnp.ndarray:
    """[N, L] -> [2, L]: modular sums of the two halves (one sumcheck round's
    univariate in evaluation form; reference ``basic_sumcheck/prover.rs:74-89``)."""
    N = table.shape[0]
    halves = table.reshape(2, N // 2, ctx.L)
    return arith.sum_mod(ctx, halves, axis=1)


@functools.partial(jax.jit, static_argnums=(0,))
def round0_univariate(ctx: FieldCtx, table: jnp.ndarray) -> jnp.ndarray:
    """First sumcheck round: half-sums in *plain* form, one device program."""
    return arith.from_mont(ctx, sum_halves(ctx, table))


@functools.partial(jax.jit, static_argnums=(0,))
def fused_round(ctx: FieldCtx, table: jnp.ndarray, r: jnp.ndarray):
    """One sumcheck round in ONE device program: fold the previous challenge,
    then produce the next round univariate (plain form, ready to serialize).

    Host<->device round trips dominate protocol latency (one Fiat-Shamir sync
    per round is inherent); fusing fold + half-sums + Montgomery-demotion
    keeps it to a single program dispatch per round.
    """
    folded, univ_m = fold_and_half_sums(ctx, table, r)
    return arith.from_mont(ctx, univ_m), folded


@functools.partial(jax.jit, static_argnums=(0,))
def fold_chain(ctx: FieldCtx, table: jnp.ndarray, rs: jnp.ndarray) -> jnp.ndarray:
    """Fold variable 0 at each point of ``rs [k, L]`` in ONE device program
    (a per-point dispatch costs one ~35 ms tunnel round trip each)."""
    t = table
    for i in range(rs.shape[0]):
        t = fold(ctx, t, 0, rs[i])
    return t


@functools.partial(jax.jit, static_argnums=(0,))
def tensor_add(ctx: FieldCtx, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Outer sum: out[i*Nc + j] = b[i] + c[j] (evaluation_form.rs:108-124)."""
    out = arith.add(ctx, b[:, None, :], c[None, :, :])
    return out.reshape(-1, ctx.L)


@functools.partial(jax.jit, static_argnums=(0,))
def tensor_mul(ctx: FieldCtx, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Outer product: out[i*Nc + j] = b[i] * c[j] (evaluation_form.rs:126-143)."""
    out = arith.mont_mul(ctx, b[:, None, :], c[None, :, :])
    return out.reshape(-1, ctx.L)


class MultilinearPolynomial:
    """Evaluation-form MLE over a device limb table (Montgomery form)."""

    def __init__(self, ctx: FieldCtx, table: jnp.ndarray):
        n = table.shape[0]
        assert n > 0 and (n & (n - 1)) == 0, "Evaluated values must be a power of 2"
        assert table.shape[-1] == ctx.L
        self.ctx = ctx
        self.table = table

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_ints(cls, ctx: FieldCtx, values) -> "MultilinearPolynomial":
        return cls(ctx, ctx.array(list(values)))

    # -- reference API -------------------------------------------------------
    def __len__(self):
        return self.table.shape[0]

    @property
    def number_of_variables(self) -> int:
        return int(self.table.shape[0]).bit_length() - 1

    def partial_evaluate(self, var: int, value) -> "MultilinearPolynomial":
        r = self._as_scalar(value)
        return MultilinearPolynomial(self.ctx, fold(self.ctx, self.table, var, r))

    def evaluate(self, values) -> int:
        """Evaluate at a point (list of ints / scalars); returns canonical int."""
        values = list(values)
        if not values:
            return self.ctx.to_ints(self.table[0])
        rs = jnp.stack([self._as_scalar(v) for v in values])
        return self.ctx.to_ints(fold_chain(self.ctx, self.table, rs)[0])

    def scalar_mul(self, value) -> "MultilinearPolynomial":
        r = self._as_scalar(value)
        return MultilinearPolynomial(self.ctx, arith.mont_mul(self.ctx, self.table, r))

    def add(self, other: "MultilinearPolynomial") -> "MultilinearPolynomial":
        assert len(self) == len(other), (
            "Polynomials must have same number of evaluations for addition"
        )
        return MultilinearPolynomial(self.ctx, arith.add(self.ctx, self.table, other.table))

    def tensor_add(self, other: "MultilinearPolynomial") -> "MultilinearPolynomial":
        assert len(self) == len(other)
        return MultilinearPolynomial(self.ctx, tensor_add(self.ctx, self.table, other.table))

    def tensor_mul(self, other: "MultilinearPolynomial") -> "MultilinearPolynomial":
        assert len(self) == len(other), "Different polynomial length"
        return MultilinearPolynomial(self.ctx, tensor_mul(self.ctx, self.table, other.table))

    def sum(self) -> int:
        return self.ctx.to_ints(arith.sum_mod(self.ctx, self.table))

    def convert_to_bytes(self) -> bytes:
        """Big-endian canonical bytes of every evaluation, concatenated
        (evaluation_form.rs:35-43)."""
        plain = arith.from_mont(self.ctx, self.table)
        return limbs_to_bytes_be(self.ctx, plain)

    def to_ints(self):
        return self.ctx.to_ints(self.table)

    # -- helpers -------------------------------------------------------------
    def _as_scalar(self, value) -> jnp.ndarray:
        if isinstance(value, (int, np.integer)):
            return self.ctx.scalar(int(value))
        return value  # already a Montgomery [L] limb vector

    def __eq__(self, other):
        return (
            isinstance(other, MultilinearPolynomial)
            and len(self) == len(other)
            and bool(jnp.all(self.table == other.table))
        )


def limbs_to_bytes_be(ctx: FieldCtx, plain_limbs: jnp.ndarray) -> bytes:
    """[N, L] strict *plain* (non-Montgomery) limbs -> concatenated BE bytes."""
    a = np.asarray(jax.device_get(plain_limbs)).astype(np.uint16)
    a = a[..., ::-1]  # big-endian limb order
    out = a.astype(">u2").tobytes()
    # nbytes per element must match arkworks bigint width
    per = ctx.L * 2
    if per == ctx.nbytes:
        return out
    # L*16 bits wider than the serialized bigint (never happens for our fields)
    raise NotImplementedError
