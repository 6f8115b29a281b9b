"""Bailey / six-step NTT generalized to R passes of VMEM-resident transforms.

The stage-at-a-time device NTT (``ntt.py``) pays ~4 HBM round trips per
butterfly stage -- 20 stages at 2^20 is ~80 passes over the table.  Here the
transform decomposes as N = m_0 * m_1 * ... * m_{R-1} (each m_i <= 256) and
each digit's NTT runs entirely inside VMEM as one Pallas kernel sweep; the
classic six-step inter-factor twiddle multiplies are fused into the next
pass's prologue.  A 2^20 transform is 3 kernel passes + 3 XLA reorder passes
instead of ~80.

In-kernel layout is limb-leading ``[L, m, bb]``: the transform axis m rides
sublanes (butterfly halves are sublane slices) and bb=128 batch columns ride
the lanes.  Twiddles per butterfly stage are static slices of one packed
[S, L, m/2] table.

Math (verified against the stage-at-a-time NTT): peeling the high digit of
n = n_0 * (N/m_0) + rest gives

    X[k_0 + m_0*k_1 + m_0*m_1*k_2 + ...] =
        NTT_{m_{R-1}}( ... w-twiddles ... NTT_{m_0}(x) )

with pass i transforming digit n_i by the canonical m_i-th root w^(N/m_i),
and pass i (i>=1) pre-multiplying by w_{M_{i-1}}^(rev(k_{i-1}) * n_remaining)
where M_j = m_j * m_{j+1} * ... * m_{R-1}.  Each DIF pass emits its digit
bit-reversed; one final gather restores natural order.

Fills the reference's empty ``fft`` crate slot (``fft/src/lib.rs`` is 0
lines) at BASELINE config-2 scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import arith
from ..fields.arith import FieldCtx, field_ctx
from ..fields.pallas_kernels import (
    _add_rows,
    _consts_for,
    _mont_mul_rows,
    _sub_rows,
)


def _bit_reverse(n_log2: int) -> np.ndarray:
    n = 1 << n_log2
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(n_log2):
        rev |= ((idx >> b) & 1) << (n_log2 - 1 - b)
    return rev


def _split_logs(k: int, max_log: int = 8, min_log: int = 3) -> list[int]:
    """Split k into the fewest factors, each in [min_log, max_log], balanced."""
    if k <= max_log:
        return [k]
    r = -(-k // max_log)
    base, extra = divmod(k, r)
    logs = [base + (1 if i < extra else 0) for i in range(r)]
    assert all(min_log <= l <= max_log for l in logs), logs
    return logs


def _dif_sweep(ctx: FieldCtx, t: jnp.ndarray, tws: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """All log2(m) Gentleman-Sande stages over axis 1 of ``t [L, m, bb]``.

    Natural order in, bit-reversed order out.  tws: [S, L, m/2, 1] (trailing
    unit dim keeps the twiddle value on sublanes so Mosaic can broadcast it
    to rank 4), stage s slot j holding w_m^(j << s) (valid for j < m >> (s+1)).
    """
    L, m, bb = t.shape
    S = m.bit_length() - 1
    for s in range(S):
        H = m >> (s + 1)
        G = m // (2 * H)
        x = t.reshape(L, G, 2 * H, bb)
        u = x[:, :, :H]
        v = x[:, :, H:]
        lo = _add_rows(ctx, u, v, consts)
        diff = _sub_rows(ctx, u, v, consts)
        tw = jax.lax.broadcast_in_dim(tws[s, :, :H], (L, 1, H, 1), (0, 2, 3))
        hi = _mont_mul_rows(ctx, diff, tw, consts)
        t = jnp.concatenate([lo, hi], axis=2).reshape(L, m, bb)
    return t


def _bntt_kernel(ctx: FieldCtx, x_ref, tws_ref, c_ref, o_ref):
    o_ref[:] = _dif_sweep(ctx, x_ref[:], tws_ref[:], c_ref[:])


def _bntt_tw_kernel(ctx: FieldCtx, scaled: bool, x_ref, tws_ref, pre_ref, c_ref, o_ref):
    """Twiddled pass: pre-multiply by the inter-factor twiddle block, run the
    DIF sweep, optionally scale by the consts row-4 constant (1/N, inverse)."""
    consts = c_ref[:]
    t = _mont_mul_rows(ctx, x_ref[:], pre_ref[:], consts)
    t = _dif_sweep(ctx, t, tws_ref[:], consts)
    if scaled:
        s = consts[4, : ctx.L]  # [L, 1] sublane-major column
        s = jax.lax.broadcast_in_dim(s, (ctx.L, 1, 1), (0, 1))
        t = _mont_mul_rows(ctx, t, s, consts)
    o_ref[:] = t


@functools.partial(jax.jit, static_argnums=(0, 3, 5))
def _batched_dif(ctx: FieldCtx, x: jnp.ndarray, tws: jnp.ndarray, bb: int,
                 pre: jnp.ndarray | None = None, scale_mont: tuple | None = None) -> jnp.ndarray:
    """x: [L, m, B] -> DIF NTT over axis 1 per lane column (B % bb == 0).

    scale_mont: optional tuple of L Montgomery limb ints (1/N for inverse);
    appended as consts row 4 so the kernel sees it as a plain input.
    """
    L, m, B = x.shape
    S = m.bit_length() - 1
    cts = jnp.asarray(_consts_for(ctx.name))
    if scale_mont is not None:
        row = jnp.zeros((1, L + 1), jnp.uint32).at[0, :L].set(jnp.asarray(scale_mont, jnp.uint32))
        cts = jnp.concatenate([cts, row], axis=0)
    # sublane-major layouts: consts [rows, L+1, 1] and twiddles [S, L, m/2, 1]
    # keep constant values off the lane axis so Mosaic can broadcast them to
    # the rank-4 butterfly views (see pallas_kernels._col)
    cts = cts[:, :, None]
    tws = tws[..., None]
    col_spec = pl.BlockSpec((L, m, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((S, L, m // 2, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((cts.shape[0], L + 1, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    params = dict(
        out_shape=jax.ShapeDtypeStruct((L, m, B), jnp.uint32),
        grid=(B // bb,),
        out_specs=col_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    if pre is None:
        return pl.pallas_call(
            functools.partial(_bntt_kernel, ctx),
            in_specs=[col_spec, tw_spec, c_spec],
            **params,
        )(x, tws, cts)
    return pl.pallas_call(
        functools.partial(_bntt_tw_kernel, ctx, scale_mont is not None),
        in_specs=[col_spec, tw_spec, col_spec, c_spec],
        **params,
    )(x, tws, pre, cts)


class SixStepPlan:
    """Precomputed tables for one (field, N, root) multi-pass transform.

    Two execution modes share the same math and pre-twiddle tables:

    * ``use_mxu=False``: Gentleman-Sande butterfly sweeps on the VPU
      (``_batched_dif``), factors up to 2^8.
    * ``use_mxu=True`` (default on TPU): each radix-m pass is ONE digit
      matmul on the MXU (``fields.mxu_mul.dft_mxu``), factors up to 2^5 --
      the exactness cap of f32 accumulation.  The inverse 1/N scale folds
      into the last pass's matrix for free.

    Both emit digits bit-reversed (DIF convention), so pass structure,
    pre-twiddles, and the final reorder are identical.
    """

    def __init__(self, field_name: str, n_log2: int, root: int, inverse: bool = False,
                 use_mxu: bool | None = None):
        ctx = field_ctx(field_name)
        self.ctx = ctx
        self.n_log2 = n_log2
        self.N = 1 << n_log2
        p = ctx.p
        w = pow(root, p - 2, p) if inverse else root
        if use_mxu is None:
            use_mxu = jax.default_backend() == "tpu"
        self.use_mxu = use_mxu
        self.logs = _split_logs(n_log2, max_log=5 if use_mxu else 8)
        self.ms = [1 << l for l in self.logs]
        R = len(self.ms)
        self.revs = [_bit_reverse(l) for l in self.logs]

        inv_n = pow(self.N, p - 2, p)
        if use_mxu:
            from ..fields.mxu_mul import dft_matrix

            self.Ds = [
                jnp.asarray(dft_matrix(
                    ctx,
                    pow(w, self.N // m, p),
                    m,
                    scale=(inv_n if inverse and i == R - 1 else 1),
                ))
                for i, m in enumerate(self.ms)
            ]
            self.tws = None
        else:
            # per-pass butterfly twiddles: pass i uses the canonical m_i-th root
            self.tws = [
                self._stage_twiddles(pow(w, self.N // m, p), m) for m in self.ms
            ]
        # per-pass fused pre-twiddles (pass 0 has none)
        self.pres = [None] + [self._pre_matrix(w, i) for i in range(1, R)]
        self.scale = (
            tuple(int(v) for v in np.asarray(ctx.scalar(inv_n)))
            if inverse
            else None
        )
        self.bb = 128

    # -- table builders -------------------------------------------------------
    def _powers(self, base: int, count: int) -> list[int]:
        vals, acc = [], 1
        for _ in range(count):
            vals.append(acc)
            acc = acc * base % self.ctx.p
        return vals

    def _stage_twiddles(self, w_m: int, m: int) -> jnp.ndarray:
        """[S, L, m/2]: stage s, slot j = w_m^(j << s) (Montgomery limbs)."""
        ctx = self.ctx
        S = m.bit_length() - 1
        half = max(m // 2, 1)
        out = np.zeros((S, half, ctx.L), np.uint32)
        for s in range(S):
            H = m >> (s + 1)
            out[s, :H] = np.asarray(ctx.array(self._powers(pow(w_m, 1 << s, ctx.p), H)))
        return jnp.asarray(out).transpose(0, 2, 1)  # [S, L, m/2]

    def _w_pow_matrix(self, w: int, e: np.ndarray) -> jnp.ndarray:
        """w^e (mod p) elementwise on device: e int64 [..., ] < N."""
        ctx = self.ctx
        lo_bits = min(self.n_log2, 10)
        lo = ctx.array(self._powers(w, 1 << lo_bits))
        hi = ctx.array(self._powers(pow(w, 1 << lo_bits, ctx.p), 1 << max(self.n_log2 - lo_bits, 0)))
        mask = (1 << lo_bits) - 1
        return arith.mont_mul(
            ctx, lo[jnp.asarray(e & mask)], hi[jnp.asarray(e >> lo_bits)]
        )  # [..., L]

    def _pre_matrix(self, w: int, i: int) -> jnp.ndarray:
        """Pass-i prologue twiddle in pass-i layout [L, m_i, B_i].

        B_i flattens (k_0r, ..., k_{i-1}r, n_{i+1}, ..., n_{R-1}); the
        exponent is (N / M_{i-1}) * rev(k_{i-1}) * (n_i * M_{i+1} + n_rest)
        with M_j = prod(ms[j:]).
        """
        ms, revs, N = self.ms, self.revs, self.N
        R = len(ms)
        M_prev = int(np.prod(ms[i - 1 :]))  # M_{i-1}
        M_next = int(np.prod(ms[i + 1 :])) if i + 1 < R else 1  # M_{i+1}
        base_exp = N // M_prev

        # digit grids, ordered [n_i, k_0r..k_{i-1}r, n_{i+1}..n_{R-1}]
        axes = [ms[i]] + ms[:i] + ms[i + 1 :]
        ndim = len(axes)

        def grid(pos, vals):
            shape = [1] * ndim
            shape[pos] = len(vals)
            return np.asarray(vals, np.int64).reshape(shape)

        n_i = grid(0, np.arange(ms[i]))
        k_prev_rev = grid(i, revs[i - 1])  # k_{i-1}r sits at batch slot i-1 -> overall pos i
        n_rest = np.zeros([1] * ndim, np.int64)
        stride = 1
        for j in range(R - 1, i, -1):  # little-endian accumulate remaining digits
            pos = 1 + i + (j - i - 1)  # overall position of n_j
            n_rest = n_rest + grid(pos, np.arange(ms[j])) * stride
            stride *= ms[j]
        e = (base_exp * k_prev_rev % N) * ((n_i * M_next + n_rest) % N) % N
        e = np.broadcast_to(e, axes).reshape(ms[i], -1)
        mat = self._w_pow_matrix(w, e)  # [m_i, B_i, L]
        return mat.transpose(2, 0, 1)  # [L, m_i, B_i]

    # -- the transform --------------------------------------------------------
    def __call__(self, table: jnp.ndarray) -> jnp.ndarray:
        """[N, L] Montgomery -> transformed [N, L] (natural order both ends)."""
        ctx, ms, N = self.ctx, self.ms, self.N
        R = len(ms)
        L = ctx.L
        bb = self.bb

        # [N, L] -> [L, n_0, n_1, ..., n_{R-1}]
        x = table.reshape(*ms, L)
        x = x.transpose(R, *range(R))

        for i in range(R):
            # bring digit n_i to axis 1; batch order (k_0r..k_{i-1}r, n_{i+1}..)
            # current shape: [L, k_0r, ..., k_{i-1}r, n_i, n_{i+1}, ...]
            perm = (0, i + 1) + tuple(range(1, i + 1)) + tuple(range(i + 2, R + 1))
            x = x.transpose(perm)  # [L, n_i, batch...]
            shape = x.shape
            x = x.reshape(L, ms[i], -1)
            B = x.shape[2]
            blk = bb if B % bb == 0 else B
            if self.use_mxu:
                from ..fields.mxu_mul import dft_mxu

                x = dft_mxu(ctx, x, self.Ds[i], ms[i], blk, self.pres[i])
            else:
                scale = self.scale if i == R - 1 else None
                if scale is not None and self.pres[i] is None:  # R == 1 inverse
                    x = _batched_dif(ctx, x, self.tws[i], blk, None, None)
                    s = jnp.asarray(scale, jnp.uint32)
                    x = arith.mont_mul(ctx, x.transpose(1, 2, 0), s).transpose(2, 0, 1)
                else:
                    x = _batched_dif(ctx, x, self.tws[i], blk, self.pres[i], scale)
            x = x.reshape(L, ms[i], *shape[2:])
            # restore canonical order [L, k_0r.., k_ir, n_{i+1}..]
            inv = (0,) + tuple(range(2, i + 2)) + (1,) + tuple(range(i + 2, R + 1))
            x = x.transpose(inv)

        # x: [L, k_0r, ..., k_{R-1}r]; natural k = k_0 + m_0 k_1 + m_0 m_1 k_2...
        idx = tuple(
            jnp.asarray(self.revs[j]).reshape(
                tuple(len(self.revs[j]) if t == j else 1 for t in range(R))
            )
            for j in range(R)
        )
        nat = x[(slice(None),) + idx]  # [L, k_0, k_1, ..., k_{R-1}]
        # flatten little-endian: index k_0 + m_0*k_1 + ... => last digit major
        nat = nat.transpose(tuple(range(R, 0, -1)) + (0,))  # [k_{R-1}, ..., k_0, L]
        return nat.reshape(N, L)
