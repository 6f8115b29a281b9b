"""Whole-proof fused sumcheck: every round, fold, and Fiat-Shamir challenge
in ONE device program.

Through the remote-TPU tunnel a host<->device round trip costs ~35 ms while a
2^20-table round is <5 ms of kernel time, so the host-synced loop (one sync
per round, ``basic_sumcheck/prover.rs:35-71``) is latency-bound by >10x.  The
device-resident Keccak sponge (``transcript.device_fs``) removes the protocol's
only inherent host dependency; what remains is a single jit program that:

  per round: absorb round-univariate BE bytes -> squeeze challenge
             -> fold the table -> half-sums for the next univariate

and returns all round univariates (plain + Montgomery form), the challenge
digests, and the final sponge state in one transfer.  Transcript bytes are
bit-identical to the host path (cross-checked in tests/test_sumcheck.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.composed import collapse_sum_of_products
from ..poly.multilinear import fold, fold_and_half_sums, fold_and_half_sums_lm, sum_halves
from ..transcript.device_fs import DeviceSponge, digest_to_mont, pack_bytes_be, pack_bytes_le
from ..transcript.keccak import RATE


def final_pos(pos: int, n_rounds: int, absorb_bytes: int) -> int:
    """Static buffer fill level after n rounds of (absorb k, squeeze)."""
    for _ in range(n_rounds):
        pos = (pos + absorb_bytes) % RATE
        pos = (pos + 32) % RATE
    return pos


@functools.partial(jax.jit, static_argnums=(0, 4))
def fused_basic_prove(
    ctx: FieldCtx, table: jnp.ndarray, state: jnp.ndarray, buf: jnp.ndarray, pos: int
):
    """All n = log2(N) rounds of the basic sumcheck prover, one dispatch.

    table: [N, L] Montgomery.  state/buf/pos: device sponge seeded with the
    initial-polynomial + claimed-sum absorbs (done host-side via native
    keccak, which beats streaming the table's bytes back to the host).

    Returns (univs_plain [n,2,L], univs_mont [n,2,L], digests [n,32],
    state', buf').
    """
    N = table.shape[0]
    n = N.bit_length() - 1
    sponge = DeviceSponge(state, buf, pos)

    # Large rounds run limb-major ([L, N]: element axis on lanes -> full-lane
    # DMA + MXU fold); one transpose in, one transpose out when the table
    # gets small.  Bit-identical to the limb-minor path.
    LM_MIN = 512
    limb_major = jax.default_backend() == "tpu" and N >= 2 * LM_MIN
    if limb_major:
        lm = table.T

    univs_mont = []
    univs_plain = []
    digests = []
    univ_m = sum_halves(ctx, table)  # [2, L]
    univ_p = arith.from_mont(ctx, univ_m)
    for rnd in range(n):
        univs_mont.append(univ_m)
        univs_plain.append(univ_p)
        sponge = sponge.absorb(pack_bytes_be(ctx, univ_p))
        digest, sponge = sponge.squeeze()
        digests.append(digest)
        if rnd < n - 1:
            r = digest_to_mont(ctx, digest)
            if limb_major and lm.shape[1] >= 2 * LM_MIN:
                lm, univ_m = fold_and_half_sums_lm(ctx, lm, r)
                if lm.shape[1] < 2 * LM_MIN:
                    table = lm.T
            else:
                table, univ_m = fold_and_half_sums(ctx, table, r)
            univ_p = arith.from_mont(ctx, univ_m)

    return (
        jnp.stack(univs_plain),
        jnp.stack(univs_mont),
        jnp.stack(digests),
        sponge.state,
        sponge.buf,
    )


# ---------------------------------------------------------------------------
# fused GKR-variant sumcheck (composed SumPolynomial working set)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _vandermonde_inv_mont(field_name: str, npoints: int) -> np.ndarray:
    """Inverse Vandermonde over x = 0..npoints-1, Montgomery limbs
    [npoints, npoints, L]: coefficients = Vinv @ evaluations.

    Replaces the host Lagrange interpolation
    (``dense_univariate.rs:74-98``) with one constant device matmul."""
    from ..fields.arith import _limbs_of_int, field_ctx

    ctx = field_ctx(field_name)
    p = ctx.p
    n = npoints
    # Lagrange basis coefficients: column k of Vinv = coeffs of l_k(x)
    vinv = [[0] * n for _ in range(n)]
    for k in range(n):
        num = [1]
        for x in range(n):
            if x != k:
                new = [0] * (len(num) + 1)
                for i, c in enumerate(num):
                    new[i] = (new[i] - c * x) % p
                    new[i + 1] = (new[i + 1] + c) % p
                num = new
        denom = 1
        for x in range(n):
            if x != k:
                denom = denom * (k - x) % p
        dinv = pow(denom, p - 2, p)
        for j in range(n):
            vinv[j][k] = num[j] * dinv % p
    out = np.zeros((n, n, ctx.L), np.uint32)
    for j in range(n):
        for k in range(n):
            out[j, k] = _limbs_of_int(vinv[j][k] * ctx.R % p, ctx.L)
    return out


def _round_evals_mont(ctx: FieldCtx, stacked: jnp.ndarray) -> jnp.ndarray:
    """[p, k, N, L] -> [k+1, L] Montgomery round-univariate evaluations at
    t = 0..degree (sumcheck_gkr_protocol.rs:113-143)."""
    degree = stacked.shape[1]
    outs = []
    for t in range(degree + 1):
        folded = fold(ctx, stacked, 0, ctx.scalar(t))
        collapsed = collapse_sum_of_products(ctx, folded)
        outs.append(arith.sum_mod(ctx, collapsed))
    return jnp.stack(outs)


def _interpolate_mont(ctx: FieldCtx, vinv: jnp.ndarray, evals_m: jnp.ndarray) -> jnp.ndarray:
    """coeffs[j] = sum_k vinv[j,k] * evals[k]; all Montgomery [*, L]."""
    prods = arith.mont_mul(ctx, vinv, evals_m[None, :, :])  # [n, n, L]
    acc = prods[:, 0]
    for k in range(1, prods.shape[1]):
        acc = arith.add(ctx, acc, prods[:, k])
    return acc


@functools.partial(jax.jit, static_argnums=(0, 4))
def fused_gkr_sumcheck_prove(
    ctx: FieldCtx, stacked: jnp.ndarray, state: jnp.ndarray, buf: jnp.ndarray, pos: int
):
    """All rounds of the composed (degree-aware) sumcheck prover in ONE
    dispatch: per round evaluate at t = 0..degree, interpolate to coefficient
    form, absorb LE bytes, squeeze the challenge, fold.

    Returns (coeffs_plain [n, d+1, L], digests [n, 32], state', buf').
    Transcript bytes are bit-identical to the host path
    (``sumcheck_gkr_protocol.rs:24-67``)."""
    N = stacked.shape[2]
    n = N.bit_length() - 1
    d = stacked.shape[1]
    vinv = jnp.asarray(_vandermonde_inv_mont(ctx.name, d + 1))
    sponge = DeviceSponge(state, buf, pos)

    coeffs_out = []
    digests = []
    evals_m = _round_evals_mont(ctx, stacked)
    for rnd in range(n):
        coeffs_p = arith.from_mont(ctx, _interpolate_mont(ctx, vinv, evals_m))
        coeffs_out.append(coeffs_p)
        sponge = sponge.absorb(pack_bytes_le(ctx, coeffs_p))
        digest, sponge = sponge.squeeze()
        digests.append(digest)
        if rnd < n - 1:
            r = digest_to_mont(ctx, digest)
            stacked = fold(ctx, stacked, 0, r)
            evals_m = _round_evals_mont(ctx, stacked)

    return jnp.stack(coeffs_out), jnp.stack(digests), sponge.state, sponge.buf
