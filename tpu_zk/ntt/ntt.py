"""Radix-2 number-theoretic transform (NTT) over the scalar fields.

The reference workspace declares an ``fft`` crate but left it empty
(``fft/src/lib.rs`` is 0 lines); this module fills that slot TPU-first
(BASELINE config 2: size-2^20 forward + inverse).

Design: bit-reversal permutation (host-precomputed gather indices) followed
by log2(N) vectorized butterfly stages.  Stage twiddles are strided views of
one device-built table of root powers (log-depth doubling), so the whole
transform is gathers + fused limb arithmetic -- no scalar loops.  Works for
any field with enough 2-adicity (BN254 Fr: 2^28, BLS12-381 Fr: 2^32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx, field_ctx


@functools.lru_cache(maxsize=None)
def find_root_of_unity(field_name: str, order_log2: int) -> int:
    """Smallest-base exact 2^k-th root of unity (host, exact ints)."""
    ctx = field_ctx(field_name)
    p = ctx.p
    two_adicity = (p - 1) & -(p - 1)
    assert (1 << order_log2) <= two_adicity, (
        f"{field_name} lacks 2-adicity for 2^{order_log2}"
    )
    for g in range(2, 1000):
        w = pow(g, (p - 1) >> order_log2, p)
        # exact order 2^order_log2 <=> w^(2^(k-1)) != 1
        if order_log2 == 0 or pow(w, 1 << (order_log2 - 1), p) != 1:
            if pow(w, 1 << order_log2, p) == 1:
                return w
    raise RuntimeError("no root found")


def _bit_reverse_indices(n_log2: int) -> np.ndarray:
    n = 1 << n_log2
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(n_log2):
        rev |= ((idx >> b) & 1) << (n_log2 - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(0, 3))
def _ntt_device(ctx: FieldCtx, table: jnp.ndarray, twiddles: jnp.ndarray, n_log2: int) -> jnp.ndarray:
    """Core transform: table [N, L] bit-reversed input -> natural-order output.

    twiddles: [N/2, L] powers w^0..w^(N/2-1) of the N-th root (Montgomery).
    """
    N = 1 << n_log2
    t = table
    for s in range(1, n_log2 + 1):
        m = 1 << s
        stride = N >> s
        tw = twiddles[::stride]  # [m/2, L] = w_m^j
        x = t.reshape(N // m, 2, m // 2, ctx.L)
        u = x[:, 0]
        v = arith.mont_mul(ctx, x[:, 1], tw[None, :, :])
        lo = arith.add(ctx, u, v)
        hi = arith.sub(ctx, u, v)
        t = jnp.stack([lo, hi], axis=1).reshape(N, ctx.L)
    return t


@functools.partial(jax.jit, static_argnums=(0, 2))
def _twiddle_table(ctx: FieldCtx, w_mont: jnp.ndarray, half_log2: int) -> jnp.ndarray:
    """[2^half_log2, L] powers w^0..: log-depth doubling on device."""
    table = ctx.one_mont[None, :]
    w_pow = w_mont  # w^(2^k) after k doublings... built incrementally
    for _ in range(half_log2):
        shifted = arith.mont_mul(ctx, table, w_pow)
        table = jnp.concatenate([table, shifted], axis=0)
        w_pow = arith.mont_mul(ctx, w_pow, w_pow)
    return table


class NTT:
    def __init__(self, field_name: str, n_log2: int, root: int | None = None):
        self.field_name = field_name
        self.ctx = field_ctx(field_name)
        self.n_log2 = n_log2
        self.N = 1 << n_log2
        self.root = root if root is not None else find_root_of_unity(field_name, n_log2)
        assert pow(self.root, self.N, self.ctx.p) == 1
        p = self.ctx.p
        self.root_inv = pow(self.root, p - 2, p)
        self.n_inv = pow(self.N, p - 2, p)
        self._rev = jnp.asarray(_bit_reverse_indices(n_log2))
        self._tw_fwd = _twiddle_table(self.ctx, self.ctx.scalar(self.root), max(n_log2 - 1, 0))
        self._tw_inv = _twiddle_table(self.ctx, self.ctx.scalar(self.root_inv), max(n_log2 - 1, 0))
        self._plans = {}  # direction -> SixStepPlan (lazy; TPU large-N path)

    def _plan(self, inverse: bool):
        """Multi-pass VMEM-resident plan (sixstep.py) -- ~2-3x the per-stage
        path at 2^18+ by fusing all butterflies of each factor into one
        Pallas sweep."""
        import jax as _jax

        if _jax.default_backend() != "tpu" or self.n_log2 < 12:
            return None
        if inverse not in self._plans:
            from .sixstep import SixStepPlan

            self._plans[inverse] = SixStepPlan(
                self.field_name, self.n_log2, self.root, inverse=inverse
            )
        return self._plans[inverse]

    def forward(self, table: jnp.ndarray) -> jnp.ndarray:
        """[N, L] Montgomery coefficients -> evaluations at root powers."""
        plan = self._plan(inverse=False)
        if plan is not None:
            return plan(table)
        t = jnp.take(table, self._rev, axis=0)
        return _ntt_device(self.ctx, t, self._tw_fwd, self.n_log2)

    def inverse(self, table: jnp.ndarray) -> jnp.ndarray:
        plan = self._plan(inverse=True)
        if plan is not None:
            return plan(table)
        t = jnp.take(table, self._rev, axis=0)
        out = _ntt_device(self.ctx, t, self._tw_inv, self.n_log2)
        return arith.mont_mul(self.ctx, out, self.ctx.scalar(self.n_inv))

    # host-convenience wrappers
    def forward_ints(self, values: list[int]) -> list[int]:
        return self.ctx.to_ints(self.forward(self.ctx.array(values)))

    def inverse_ints(self, values: list[int]) -> list[int]:
        return self.ctx.to_ints(self.inverse(self.ctx.array(values)))


def polynomial_multiply(field_name: str, a: list[int], b: list[int]) -> list[int]:
    """Coefficient-domain product via NTT (for large univariate work; the
    reference's O(n^2) ``multiply_polynomials`` is the small-degree host path)."""
    ctx = field_ctx(field_name)
    out_len = len(a) + len(b) - 1
    n_log2 = max(out_len - 1, 1).bit_length()
    ntt = NTT(field_name, n_log2)
    fa = ntt.forward(ctx.array(list(a) + [0] * (ntt.N - len(a))))
    fb = ntt.forward(ctx.array(list(b) + [0] * (ntt.N - len(b))))
    prod = arith.mont_mul(ctx, fa, fb)
    res = ntt.inverse(prod)
    return ctx.to_ints(res)[:out_len]
