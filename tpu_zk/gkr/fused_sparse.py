"""Fused linear-time GKR prover: zero host syncs inside the layer loop.

``sparse.prove`` is dispatch/compile-bound, not math-bound: each layer's two
phase sumchecks re-enter Python, re-seed the device sponge from the host
transcript, and compile a *whole-proof* fused program per (layer, phase)
shape -- at depth 20 that is ~40 large unrolled programs and ~446 gates/s
measured (r2).  This module restructures the prover around a small pool of
per-table-size programs that chain **asynchronously** on device:

  - ``_round``      one sumcheck round (evals at t=0..2, interpolate, absorb
                    LE, squeeze, fold) -- ONE compile per table size, reused
                    across every layer, both phases, and both tree depths;
  - ``_phase1`` / ``_phase2``   bookkeeping-table builds (segment sums over
                    the sparse gate list, Libra phase split);
  - ``_prologue0`` / ``_epilogue``  the w0 challenge and the alpha/beta
                    claim-fold between layers.

The Fiat-Shamir sponge position differs call-to-call, so the sponge ops carry
it as a *traced* scalar (``transcript.device_fs.absorb_dyn/squeeze_dyn``) --
this is what lets one compiled round program serve every call site.  The host
drives the loop but never materializes a device value until the very end
(one batched transfer assembles the Proof), so the ~25 ms tunnel round trip
is paid once, not per round.

Proof bytes and transcripts are bit-identical to ``sparse.prove`` and hence
to the dense reference pipeline (``gkr/src/gkr_protocol.rs:26-143``);
``tests/test_fused_sparse.py`` asserts equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.layered import ADD, Circuit
from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.multilinear import fold
from ..poly.univariate import DenseUnivariatePolynomial
from ..sumcheck.fused import _interpolate_mont, _round_evals_mont, _vandermonde_inv_mont
from ..sumcheck.gkr_sumcheck import SumcheckProverProof
from ..transcript.device_fs import (
    DeviceSponge,
    absorb_dyn,
    digest_to_mont,
    pack_bytes_be,
    pack_bytes_le,
    squeeze_dyn,
)
from ..transcript.fiat_shamir import Transcript
from .protocol import Proof, _w0_padded
from .sparse import _eq_table_from, mont_segment_sum


# ---------------------------------------------------------------------------
# device program pool (all dynamic-pos; one compile per distinct shape)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def _prologue0(ctx: FieldCtx, w0_table, state, buf, pos):
    """Squeeze ra, fold w0 at ra -> initial claimed sum (gkr_protocol.rs:49-55)."""
    digest, state, buf, pos = squeeze_dyn(state, buf, pos)
    ra = digest_to_mont(ctx, digest)
    claim_m = fold(ctx, w0_table, 0, ra)[0]
    return ra, claim_m, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0,))
def _w_out0(ctx: FieldCtx, ra, outs):
    """Layer-0 gate weights: eq(ra, out_g) (1-bit output variable)."""
    return _eq_table_from(ctx, ra[None, :])[outs]


@functools.partial(jax.jit, static_argnums=(0,))
def _w_out_fold(ctx: FieldCtx, rb, rc, alpha_m, beta_m, outs):
    """alpha*eq(rb, out) + beta*eq(rc, out) per gate (utils.rs:23-68, sparsely)."""
    a = arith.mont_mul(ctx, _eq_table_from(ctx, rb), alpha_m)
    b = arith.mont_mul(ctx, _eq_table_from(ctx, rc), beta_m)
    return arith.add(ctx, a, b)[outs]


@functools.partial(jax.jit, static_argnums=(0,))
def _phase1(ctx: FieldCtx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos):
    """Absorb the layer claim (BE) and build the phase-1 working set
    [[w, A1+M1], [A2, 1]] from the sparse gate list."""
    claim_p = arith.from_mont(ctx, claim_m)
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_be(ctx, claim_p))
    S = w_table.shape[0]
    wr = arith.mont_mul(ctx, w_out, w_table[rights])
    zero = jnp.zeros_like(wr)
    a1 = mont_segment_sum(ctx, jnp.where(is_add, w_out, zero), lefts, S)
    m1 = mont_segment_sum(ctx, jnp.where(is_add, zero, wr), lefts, S)
    a2 = mont_segment_sum(ctx, jnp.where(is_add, wr, zero), lefts, S)
    ones = jnp.broadcast_to(ctx.one_mont, (S, ctx.L))
    stacked = jnp.stack(
        [jnp.stack([w_table, arith.add(ctx, a1, m1)]), jnp.stack([a2, ones])]
    )
    return stacked, claim_p, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0,))
def _phase2(ctx: FieldCtx, w_table, w_out, rb, lefts, rights, is_add, wb_star_m):
    """Phase-2 working set [[A', w(b*)+w], [M'*w(b*), w]] with eq(b*, left)
    folded into the gate weights."""
    S = w_table.shape[0]
    eq_b = _eq_table_from(ctx, rb)[lefts]
    w_eq = arith.mont_mul(ctx, w_out, eq_b)
    zero = jnp.zeros_like(w_eq)
    a_p = mont_segment_sum(ctx, jnp.where(is_add, w_eq, zero), rights, S)
    m_p = mont_segment_sum(ctx, jnp.where(is_add, zero, w_eq), rights, S)
    w_plus = arith.add(ctx, w_table, wb_star_m)
    m_scaled = arith.mont_mul(ctx, m_p, wb_star_m)
    return jnp.stack([jnp.stack([a_p, w_plus]), jnp.stack([m_scaled, w_table])])


@functools.partial(jax.jit, static_argnums=(0,))
def _round(ctx: FieldCtx, stacked, state, buf, pos):
    """One composed-sumcheck round: univariate at t=0..deg, interpolate to
    coefficients, absorb LE bytes, squeeze, fold at the challenge.

    Folds the challenge in unconditionally (unlike the whole-proof fused
    program) so the [0,0]/[1,1] slots end fully evaluated at rb/rc."""
    d = stacked.shape[1]
    vinv = jnp.asarray(_vandermonde_inv_mont(ctx.name, d + 1))
    evals_m = _round_evals_mont(ctx, stacked)
    coeffs_p = arith.from_mont(ctx, _interpolate_mont(ctx, vinv, evals_m))
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_le(ctx, coeffs_p))
    digest, state, buf, pos = squeeze_dyn(state, buf, pos)
    r = digest_to_mont(ctx, digest)
    folded = fold(ctx, stacked, 0, r)
    return coeffs_p, digest, r, folded, state, buf, pos


def _lazy_lane_sum_to_mont(ctx: FieldCtx, lm: jnp.ndarray) -> jnp.ndarray:
    """Exact modular sum over the lane (element) axis of limb-major strict
    canonical [L, T] -> Montgomery [L].  Same chunked-lazy shape as
    ``arith.sum_mod`` (order-independent: modular adds are associative)."""
    L, T = lm.shape
    CH = 1 << 15
    if T > CH:
        s1 = jnp.sum(lm.reshape(L, T // CH, CH), axis=2, dtype=jnp.uint32)  # < 2^31
        strict1 = arith.carry_propagate(s1.T, ctx.L + 2)  # [K, L+2]
        lazy2 = jnp.sum(strict1, axis=0, dtype=jnp.uint32)
        wide = arith.carry_propagate(lazy2, ctx.L + 4)
    else:
        lazy = jnp.sum(lm, axis=1, dtype=jnp.uint32)  # < 2^31
        wide = arith.carry_propagate(lazy, ctx.L + 2)
    return arith.reduce_wide_to_mont(ctx, wide)


@functools.partial(jax.jit, static_argnums=(0,))
def _round_lm(ctx: FieldCtx, stacked_lm, state, buf, pos):
    """Limb-major round for the degree-2 working set [2, 2, L, S].

    The t = 0, 1, 2 sample points need NO generic multiplies (lo, hi,
    2*hi - lo); the only elementwise products are the two collapse muls per
    sample point, done by the limb-major VPU kernel, and the challenge fold
    rides the MXU digit-matmul kernel.  Bit-identical to :func:`_round`
    (asserted by tests/test_fused_sparse.py at both layouts).
    """
    from ..fields.pallas_kernels import addsub_lm_pallas, mont_mul_lm_pallas

    p_, k_, L, S = stacked_lm.shape
    T = S // 2
    d = k_  # degree = number of factors = 2
    vinv = jnp.asarray(_vandermonde_inv_mont(ctx.name, d + 1))

    lo = stacked_lm[..., :T]  # [2, 2, L, T]
    hi = stacked_lm[..., T:]
    blk = min(2048, T)

    def collapse(point):  # [2, 2, L, T] at one t -> Montgomery sum [L]
        prods = [mont_mul_lm_pallas(ctx, point[i, 0], point[i, 1], blk) for i in range(p_)]
        acc = prods[0]
        for q in prods[1:]:
            acc = addsub_lm_pallas(ctx, acc, q, "add", blk)
        return _lazy_lane_sum_to_mont(ctx, acc)

    # e(t): evaluations of each factor table at t = 0,1,2 without multiplies
    e0 = lo
    e1 = hi
    e2 = jnp.stack([
        jnp.stack([
            addsub_lm_pallas(ctx, addsub_lm_pallas(ctx, hi[i, j], hi[i, j], "add", blk), lo[i, j], "sub", blk)
            for j in range(k_)
        ])
        for i in range(p_)
    ])
    evals_m = jnp.stack([collapse(e0), collapse(e1), collapse(e2)])  # [3, L]

    coeffs_p = arith.from_mont(ctx, _interpolate_mont(ctx, vinv, evals_m))
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_le(ctx, coeffs_p))
    digest, state, buf, pos = squeeze_dyn(state, buf, pos)
    r = digest_to_mont(ctx, digest)

    from ..fields.mxu_mul import fold_mxu_lm

    fold_blk = min(8192, T // 2) if T >= 256 else 0
    if fold_blk:
        folded, _ = fold_mxu_lm(ctx, stacked_lm.reshape(p_ * k_, L, S), r, fold_blk)
        folded = folded.reshape(p_, k_, L, T)
    else:
        # small tail: generic fold on the transposed view
        folded = fold(ctx, stacked_lm.reshape(p_ * k_, L, S).transpose(0, 2, 1), 0, r)
        folded = folded.transpose(0, 2, 1).reshape(p_, k_, L, T)
    return coeffs_p, digest, r, folded, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0,))
def _epilogue(ctx: FieldCtx, wb_m, wc_m, state, buf, pos):
    """Absorb wb/wc evals (BE), squeeze alpha/beta, fold the next claim
    (gkr_protocol.rs:125-132) -- claim stays in Montgomery form on device."""
    wb_p = arith.from_mont(ctx, wb_m)
    wc_p = arith.from_mont(ctx, wc_m)
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_be(ctx, wb_p))
    d1, state, buf, pos = squeeze_dyn(state, buf, pos)
    alpha_m = digest_to_mont(ctx, d1)
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_be(ctx, wc_p))
    d2, state, buf, pos = squeeze_dyn(state, buf, pos)
    beta_m = digest_to_mont(ctx, d2)
    claim_m = arith.add(
        ctx, arith.mont_mul(ctx, alpha_m, wb_m), arith.mont_mul(ctx, beta_m, wc_m)
    )
    return wb_p, wc_p, alpha_m, beta_m, claim_m, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0,))
def _layer_small(ctx: FieldCtx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos):
    """One whole layer -- phase-1 build, s rounds, phase-2 build, s rounds --
    as a single device program (ONE dispatch).

    Small layers are dispatch-bound, not math-bound: at depth 13 the per-round
    programs cost ~2 ms of tunnel/dispatch latency each for microseconds of
    math.  This program is keyed only by the layer's table size, so one
    compile serves every layer of that size across all circuits and depths.
    Bit-identical to the unfused path (same `_phase1`/`_round`/`_phase2`
    bodies, inlined)."""
    s = int(w_table.shape[0]).bit_length() - 1
    stacked, claim_p, state, buf, pos = _phase1(
        ctx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos
    )
    coeffs, digests, rs1 = [], [], []
    for _ in range(s):
        c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
        coeffs.append(c)
        digests.append(dg)
        rs1.append(r)
    rb_st = jnp.stack(rs1)
    wb_m = stacked[0, 0, 0]

    stacked = _phase2(ctx, w_table, w_out, rb_st, lefts, rights, is_add, wb_m)
    rs2 = []
    for _ in range(s):
        c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
        coeffs.append(c)
        digests.append(dg)
        rs2.append(r)
    rc_st = jnp.stack(rs2)
    wc_m = stacked[1, 1, 0]
    return (
        claim_p,
        jnp.stack(coeffs),  # [2s, 3, L]
        jnp.stack(digests),  # [2s, 32]
        rb_st,
        rc_st,
        wb_m,
        wc_m,
        state,
        buf,
        pos,
    )


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

# working sets at least this wide run the limb-major round (_round_lm);
# below it the per-kernel dispatch overhead outweighs the layout win
_LM_MIN = 4096

# layers whose working set is at most this wide run as ONE fused device
# program (_layer_small); wider layers are math-bound and keep the
# per-round dispatch structure (limb-major MXU rounds)
_FUSE_MAX = 4096


@functools.partial(jax.jit, static_argnums=(0,))
def _to_lm(ctx: FieldCtx, stacked):
    return stacked.transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnums=(0,))
def _from_lm(ctx: FieldCtx, lm):
    return lm.transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnums=(0,))
def _rounds_tail(ctx: FieldCtx, stacked, state, buf, pos):
    """ALL remaining rounds (size S -> 1) of one phase as a single program.

    Below ``_LM_MIN`` each round is dispatch-bound; unrolling the whole tail
    collapses ~2*log2(S) dispatches into one.  Keyed by S only, so large
    layers of every depth share these compiles with each other (and the
    small fused layers' inner bodies)."""
    s = int(stacked.shape[2]).bit_length() - 1
    coeffs, digests, rs = [], [], []
    for _ in range(s):
        c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
        coeffs.append(c)
        digests.append(dg)
        rs.append(r)
    return (
        jnp.stack(coeffs),  # [s, 3, L]
        jnp.stack(digests),  # [s, 32]
        jnp.stack(rs),  # [s, L]
        stacked,
        state,
        buf,
        pos,
    )


def _run_rounds(ctx: FieldCtx, stacked, state, buf, pos, s: int):
    """s sumcheck rounds over one phase's working set; large rounds run
    limb-major, then the sub-``_LM_MIN`` tail runs as ONE fused program.
    Returns (coeffs [s,3,L], digests [s,32], rs [s,L], stacked, state, buf,
    pos)."""
    coeffs, digests, rs = [], [], []
    lm = None
    remaining = s
    if jax.default_backend() == "tpu" and stacked.shape[2] >= _LM_MIN:
        lm = _to_lm(ctx, stacked)
    while remaining and (lm is not None or stacked.shape[2] <= 2):
        if lm is not None:
            c, dg, r, lm, state, buf, pos = _round_lm(ctx, lm, state, buf, pos)
            if lm.shape[-1] < _LM_MIN:
                stacked = _from_lm(ctx, lm)
                lm = None
        else:
            c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
        coeffs.append(c)
        digests.append(dg)
        rs.append(r)
        remaining -= 1
    if lm is not None:  # only reachable if _LM_MIN were < 2; keep stacked fresh
        stacked = _from_lm(ctx, lm)
    parts_c = [jnp.stack(coeffs)] if coeffs else []
    parts_d = [jnp.stack(digests)] if digests else []
    parts_r = [jnp.stack(rs)] if rs else []
    if remaining:
        tc, td, tr, stacked, state, buf, pos = _rounds_tail(ctx, stacked, state, buf, pos)
        parts_c.append(tc)
        parts_d.append(td)
        parts_r.append(tr)
    cat = lambda ps: ps[0] if len(ps) == 1 else jnp.concatenate(ps)  # noqa: E731
    return cat(parts_c), cat(parts_d), cat(parts_r), stacked, state, buf, pos


def _drive_layers(circuit: Circuit, ev, transcript: Transcript):
    """Run every layer's two-phase sumcheck with async device chaining.

    Returns per-layer record dicts of *device* arrays plus the final
    (rb_stack, rc_stack, state, buf, pos) -- nothing is materialized.
    """
    ctx = circuit.ctx
    sponge = DeviceSponge.from_host(transcript._hasher)
    state, buf = sponge.state, sponge.buf
    pos = jnp.int32(sponge.pos)

    w0_table = ev.layer_tables[0]
    if w0_table.shape[0] == 1:  # reference pads w0 to length 2 (:39-47)
        w0_table = jnp.concatenate([w0_table, jnp.zeros_like(w0_table)])
    ra, claim_m, state, buf, pos = _prologue0(ctx, w0_table, state, buf, pos)

    records = []
    alpha_m = beta_m = None
    rb_st = rc_st = None
    for layer_index, layer in enumerate(circuit.layers):
        w_table = ev.layer_tables[layer_index + 1]
        s = int(w_table.shape[0]).bit_length() - 1
        lefts = jnp.asarray(layer.lefts)
        rights = jnp.asarray(layer.rights)
        outs = jnp.asarray(layer.outs)
        is_add = jnp.asarray(layer.ops == ADD)[:, None]

        if layer_index == 0:
            w_out = _w_out0(ctx, ra, outs)
        else:
            w_out = _w_out_fold(ctx, rb_st, rc_st, alpha_m, beta_m, outs)

        if w_table.shape[0] <= _FUSE_MAX:
            (
                claim_p, coeffs_st, digests_st, rb_st, rc_st, wb_m, wc_m,
                state, buf, pos,
            ) = _layer_small(
                ctx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos
            )
        else:
            stacked, claim_p, state, buf, pos = _phase1(
                ctx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos
            )
            coeffs1, digests1, rb_st, stacked, state, buf, pos = _run_rounds(
                ctx, stacked, state, buf, pos, s
            )
            wb_m = stacked[0, 0, 0]

            stacked = _phase2(ctx, w_table, w_out, rb_st, lefts, rights, is_add, wb_m)
            coeffs2, digests2, rc_st, stacked, state, buf, pos = _run_rounds(
                ctx, stacked, state, buf, pos, s
            )
            wc_m = stacked[1, 1, 0]
            coeffs_st = jnp.concatenate([coeffs1, coeffs2])
            digests_st = jnp.concatenate([digests1, digests2])

        rec = {
            "s": s,
            "claim_p": claim_p,
            "coeffs": coeffs_st,  # [2s, 3, L]
            "digests": digests_st,  # [2s, 32]
        }
        if layer_index < len(circuit.layers) - 1:
            wb_p, wc_p, alpha_m, beta_m, claim_m, state, buf, pos = _epilogue(
                ctx, wb_m, wc_m, state, buf, pos
            )
            rec["wb_p"] = wb_p
            rec["wc_p"] = wc_p
        records.append(rec)

    return records, rb_st, rc_st, state, buf, pos


def _limbs_to_int(ctx: FieldCtx, limbs: np.ndarray) -> int:
    v = 0
    for i in range(ctx.L - 1, -1, -1):
        v = (v << 16) | int(limbs[i])
    return v


def _assemble(ctx: FieldCtx, records) -> tuple[list, list, list, int]:
    """One batched transfer -> host proof pieces (sumcheck proofs, wb/wc
    evals, final claimed sum).

    Consolidates every layer's outputs into four device concatenations first:
    fetching hundreds of small buffers individually costs one tunnel round
    trip each, which at depth 10 was 5x the whole protocol's device time."""
    all_coeffs = jnp.concatenate([r["coeffs"] for r in records])  # [R, 3, L]
    all_digests = jnp.concatenate([r["digests"] for r in records])  # [R, 32]
    all_claims = jnp.stack([r["claim_p"] for r in records])  # [layers, L]
    evals = [r[k] for r in records if "wb_p" in r for k in ("wb_p", "wc_p")]
    all_evals = (
        jnp.stack(evals) if evals else jnp.zeros((0, ctx.L), jnp.uint32)
    )  # [2*(layers-1), L]
    coeffs_h, digests_h, claims_h, evals_h = (
        np.asarray(a)
        for a in jax.device_get((all_coeffs, all_digests, all_claims, all_evals))
    )

    layer_proofs = []
    wb_evaluations, wc_evaluations = [], []
    base = 0
    for li, rec in enumerate(records):
        s = rec["s"]
        coeffs = coeffs_h[base : base + 2 * s]  # [2s, 3, L]
        digests = digests_h[base : base + 2 * s]  # [2s, 32]
        base += 2 * s
        polys = [
            DenseUnivariatePolynomial(
                ctx, [_limbs_to_int(ctx, coeffs[i, j]) for j in range(coeffs.shape[1])]
            )
            for i in range(2 * s)
        ]
        challenges = [
            ctx.from_le_bytes_mod_order(bytes(digests[i].astype(np.uint8).tobytes()))
            for i in range(2 * s)
        ]
        layer_proofs.append(
            SumcheckProverProof(
                claimed_sum=_limbs_to_int(ctx, claims_h[li]),
                round_univariate_polynomials=polys,
                random_challenges=challenges,
            )
        )
        if "wb_p" in rec:
            wb_evaluations.append(_limbs_to_int(ctx, evals_h[2 * li]))
            wc_evaluations.append(_limbs_to_int(ctx, evals_h[2 * li + 1]))

    # final claimed sum (only consumed by Proof.claimed_sum): alpha*wb+beta*wc
    # of the last non-final layer == claim entering the last layer
    final_claim = layer_proofs[-1].claimed_sum if layer_proofs else 0
    return layer_proofs, wb_evaluations, wc_evaluations, final_claim


def prove(circuit: Circuit, inputs) -> Proof:
    """Drop-in replacement for ``sparse.prove`` (identical Proof bytes)."""
    ctx = circuit.ctx
    vals = inputs if hasattr(inputs, "shape") else list(inputs)
    ev = circuit.evaluate(vals, materialize=False)

    transcript = Transcript()
    w0_polynomial = _w0_padded(ctx, ev.output)
    transcript.append(w0_polynomial.convert_to_bytes())

    records, _, _, _, _, _ = _drive_layers(circuit, ev, transcript)
    layer_proofs, wb_evals, wc_evals, final_claim = _assemble(ctx, records)
    return Proof(
        circuit_output=ev.output,
        claimed_sum=final_claim,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evals,
        wc_evaluations=wc_evals,
    )


def prove_succinct(circuit: Circuit, inputs, trusted_setup):
    """Fused-prover succinct GKR (same bytes as ``sparse.prove_succinct``)."""
    from ..kzg import multilinear_kzg
    from ..poly.multilinear import MultilinearPolynomial
    from .succinct import SuccinctProof

    ctx = circuit.ctx
    vals = inputs if hasattr(inputs, "shape") else list(inputs)
    ev = circuit.evaluate(vals, materialize=False)

    input_polynomial = (
        MultilinearPolynomial(ctx, vals)
        if hasattr(vals, "shape")
        else MultilinearPolynomial.from_ints(ctx, vals)
    )
    input_commitment = multilinear_kzg.commit_to_polynomial(input_polynomial, trusted_setup)

    transcript = Transcript()
    w0_polynomial = _w0_padded(ctx, ev.output)
    transcript.append(w0_polynomial.convert_to_bytes())

    records, _, _, _, _, _ = _drive_layers(circuit, ev, transcript)
    layer_proofs, wb_evals, wc_evals, final_claim = _assemble(ctx, records)

    # rb/rc of the LAST layer (succinct_gkr_protocol.rs:119-126)
    last = layer_proofs[-1]
    mid = len(last.random_challenges) // 2
    rb_values = last.random_challenges[:mid]
    rc_values = last.random_challenges[mid:]
    input_rb_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rb_values)
    input_rc_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rc_values)

    return SuccinctProof(
        circuit_output=ev.output,
        claimed_sum=final_claim,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evals,
        wc_evaluations=wc_evals,
        input_polynomial_commitment=input_commitment,
        input_rb_proof=input_rb_proof,
        input_rc_proof=input_rc_proof,
    )
