"""Multi-device linear-time (Libra) GKR prover: gates + working set sharded.

Decomposition (SURVEY.md section 2 parallelism table, rows "circuit layer
eval" and "sumcheck round half-sums"):

  - **gate lists sharded** over the mesh's ``data`` axis (padded with no-op
    gates whose folded output weight is zeroed, so padding adds exact zeros);
    the phase-table segment sums become per-shard scatter-adds + one
    cross-shard ``psum`` -- GSPMD inserts the collective from the sharding
    annotations, and mod-2^32 lazy limb addition is associative, so the sums
    are bit-identical to the single-device prover.
  - **sumcheck working set interleave-sharded**: the ``[p, k, S, L]`` stacked
    table is laid out ``[p, k, D, S/D, L]`` with the *low* ``log2(D)`` index
    bits as the shard axis (same trick as ``sharded_sumcheck``).  The
    composed-sumcheck fold always targets the most-significant variable, so
    every fold pairs elements on the same shard; per-round univariate
    evaluations are per-shard partial sums + ``psum``.
  - the last ``log2(D)`` rounds of each phase run replicated (the table is
    D elements -- trivially small), keeping bytes identical.
  - ``w`` tables stay replicated as gather sources (the SURVEY row's
    "all_gather of the (much smaller) next-layer values" pattern).

Proof bytes match ``gkr.fused_sparse.prove`` / ``gkr.sparse.prove`` / the
dense reference pipeline (``gkr/src/gkr_protocol.rs:26-143``) exactly;
``tests/test_parallel.py`` asserts equality on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..circuit.layered import ADD, Circuit
from ..fields import arith
from ..fields.arith import FieldCtx
from ..gkr.fused_sparse import (
    _assemble,
    _epilogue,
    _phase1,
    _phase2,
    _prologue0,
    _round,
    _w_out0,
    _w_out_fold,
)
from ..gkr.protocol import Proof, _w0_padded
from ..gkr.sparse import _eq_table_from, mont_segment_sum
from ..poly.multilinear import fold
from ..sumcheck.fused import _interpolate_mont, _vandermonde_inv_mont
from ..transcript.device_fs import (
    DeviceSponge,
    absorb_dyn,
    digest_to_mont,
    pack_bytes_be,
    pack_bytes_le,
    squeeze_dyn,
)
from ..transcript.fiat_shamir import Transcript


def _interleave(ctx: FieldCtx, table: jnp.ndarray, D: int) -> jnp.ndarray:
    """[..., S, L] logical -> [..., D, S/D, L]: shard d, row j = logical j*D+d."""
    *lead, S, L = table.shape
    return table.reshape(*lead, S // D, D, L).swapaxes(-2, -3)


@functools.partial(jax.jit, static_argnums=(0,))
def _collapse(ctx: FieldCtx, stacked: jnp.ndarray) -> jnp.ndarray:
    """[p, k, ..., L] -> [..., L]: product over k, sum over p (elementwise)."""
    prod = stacked[:, 0]
    for j in range(1, stacked.shape[1]):
        prod = arith.mont_mul(ctx, prod, stacked[:, j])
    acc = prod[0]
    for i in range(1, stacked.shape[0]):
        acc = arith.add(ctx, acc, prod[i])
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def _round_sharded(ctx: FieldCtx, stacked: jnp.ndarray, state, buf, pos):
    """One composed-sumcheck round over the interleave-sharded working set
    ``[p, k, D, M, L]``: folds are shard-local (M-axis MSB), univariate
    evaluations are per-shard sums + psum."""
    d = stacked.shape[1]
    vinv = jnp.asarray(_vandermonde_inv_mont(ctx.name, d + 1))
    evals = []
    for t in range(d + 1):
        folded_t = fold(ctx, stacked, 0, ctx.scalar(t))  # [p, k, D, M/2, L]
        collapsed = _collapse(ctx, folded_t)  # [D, M/2, L]
        evals.append(arith.sum_mod(ctx, collapsed.reshape(-1, ctx.L)))
    evals_m = jnp.stack(evals)
    coeffs_p = arith.from_mont(ctx, _interpolate_mont(ctx, vinv, evals_m))
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_le(ctx, coeffs_p))
    digest, state, buf, pos = squeeze_dyn(state, buf, pos)
    r = digest_to_mont(ctx, digest)
    folded = fold(ctx, stacked, 0, r)
    return coeffs_p, digest, r, folded, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase1_sharded(ctx: FieldCtx, D: int, w_table, w_int, w_out,
                    lefts, rights, is_add, claim_m, state, buf, pos):
    """Sharded phase-1 working set build: gathers from the replicated w table,
    per-shard segment sums into interleaved buckets (+psum via GSPMD)."""
    claim_p = arith.from_mont(ctx, claim_m)
    state, buf, pos = absorb_dyn(state, buf, pos, pack_bytes_be(ctx, claim_p))
    S = w_table.shape[0]
    M = S // D
    idx = (lefts % D) * M + lefts // D  # interleaved bucket ids
    wr = arith.mont_mul(ctx, w_out, w_table[rights])
    zero = jnp.zeros_like(wr)
    a1 = mont_segment_sum(ctx, jnp.where(is_add, w_out, zero), idx, S)
    m1 = mont_segment_sum(ctx, jnp.where(is_add, zero, wr), idx, S)
    a2 = mont_segment_sum(ctx, jnp.where(is_add, wr, zero), idx, S)
    ones = jnp.broadcast_to(ctx.one_mont, (S, ctx.L))
    stacked = jnp.stack([
        jnp.stack([w_int, arith.add(ctx, a1, m1).reshape(D, M, ctx.L)]),
        jnp.stack([a2.reshape(D, M, ctx.L), ones.reshape(D, M, ctx.L)]),
    ])  # [2, 2, D, M, L]
    return stacked, claim_p, state, buf, pos


@functools.partial(jax.jit, static_argnums=(0, 1))
def _phase2_sharded(ctx: FieldCtx, D: int, w_table, w_int, w_out, rb,
                    lefts, rights, is_add, wb_star_m):
    S = w_table.shape[0]
    M = S // D
    idx = (rights % D) * M + rights // D
    eq_b = _eq_table_from(ctx, rb)[lefts]
    w_eq = arith.mont_mul(ctx, w_out, eq_b)
    zero = jnp.zeros_like(w_eq)
    a_p = mont_segment_sum(ctx, jnp.where(is_add, w_eq, zero), idx, S)
    m_p = mont_segment_sum(ctx, jnp.where(is_add, zero, w_eq), idx, S)
    w_plus = _interleave(ctx, arith.add(ctx, w_table, wb_star_m), D)
    m_scaled = arith.mont_mul(ctx, m_p, wb_star_m).reshape(D, M, ctx.L)
    return jnp.stack([
        jnp.stack([a_p.reshape(D, M, ctx.L), w_plus]),
        jnp.stack([m_scaled, w_int]),
    ])


def _run_phase_rounds(ctx, stacked_sh, state, buf, pos, s: int, D: int):
    """All ``s`` rounds of one phase: sharded while the local table has >= 2
    rows, then the replicated tail (logical order == interleaved at M == 1)."""
    coeffs, digests, rs = [], [], []
    sharded_rounds = max(0, min(s, (stacked_sh.shape[3]).bit_length() - 1))
    for _ in range(sharded_rounds):
        c, dg, r, stacked_sh, state, buf, pos = _round_sharded(
            ctx, stacked_sh, state, buf, pos
        )
        coeffs.append(c)
        digests.append(dg)
        rs.append(r)
    stacked = stacked_sh.reshape(*stacked_sh.shape[:2], -1, ctx.L)  # [p,k,D,L]
    for _ in range(s - sharded_rounds):
        c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
        coeffs.append(c)
        digests.append(dg)
        rs.append(r)
    return coeffs, digests, rs, stacked, state, buf, pos


def _pad_gates(layer, D: int):
    """Pad gate arrays to a multiple of D; returns (lefts, rights, outs,
    is_add, valid) host arrays."""
    G = len(layer.lefts)
    pad = (-G) % D
    lefts = np.concatenate([layer.lefts, np.zeros(pad, np.int32)])
    rights = np.concatenate([layer.rights, np.zeros(pad, np.int32)])
    outs = np.concatenate([layer.outs, np.zeros(pad, np.int32)])
    is_add = np.concatenate([layer.ops == ADD, np.ones(pad, bool)])
    valid = np.concatenate([np.ones(G, np.uint32), np.zeros(pad, np.uint32)])
    return lefts, rights, outs, is_add, valid


@functools.partial(jax.jit, static_argnums=(0,))
def _mask_rows(ctx: FieldCtx, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(valid[:, None] != 0, x, jnp.zeros_like(x))


def prove(circuit: Circuit, inputs, mesh) -> Proof:
    """Multi-device fused sparse-GKR prove (bit-identical Proof bytes)."""
    ctx = circuit.ctx
    D = int(mesh.devices.size)
    gate_shard = NamedSharding(mesh, P("data", None))
    idx_shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    wint_shard = NamedSharding(mesh, P("data", None, None))

    vals = inputs if hasattr(inputs, "shape") else list(inputs)
    ev = circuit.evaluate(vals, materialize=False)

    transcript = Transcript()
    w0_polynomial = _w0_padded(ctx, ev.output)
    transcript.append(w0_polynomial.convert_to_bytes())

    sponge = DeviceSponge.from_host(transcript._hasher)
    state, buf = sponge.state, sponge.buf
    pos = jnp.int32(sponge.pos)

    w0_table = ev.layer_tables[0]
    if w0_table.shape[0] == 1:
        w0_table = jnp.concatenate([w0_table, jnp.zeros_like(w0_table)])
    ra, claim_m, state, buf, pos = _prologue0(ctx, w0_table, state, buf, pos)

    records = []
    alpha_m = beta_m = None
    rb_st = rc_st = None
    for layer_index, layer in enumerate(circuit.layers):
        w_table = ev.layer_tables[layer_index + 1]
        S = int(w_table.shape[0])
        s = S.bit_length() - 1
        shardable = S >= 2 * D and S % D == 0

        if shardable:
            lefts_h, rights_h, outs_h, is_add_h, valid_h = _pad_gates(layer, D)
            lefts = jax.device_put(jnp.asarray(lefts_h), idx_shard)
            rights = jax.device_put(jnp.asarray(rights_h), idx_shard)
            outs = jax.device_put(jnp.asarray(outs_h), idx_shard)
            is_add = jax.device_put(jnp.asarray(is_add_h)[:, None], gate_shard)
            valid = jax.device_put(jnp.asarray(valid_h), idx_shard)
        else:
            lefts = jnp.asarray(layer.lefts)
            rights = jnp.asarray(layer.rights)
            outs = jnp.asarray(layer.outs)
            is_add = jnp.asarray(layer.ops == ADD)[:, None]
            valid = None

        if layer_index == 0:
            w_out = _w_out0(ctx, ra, outs)
        else:
            w_out = _w_out_fold(ctx, rb_st, rc_st, alpha_m, beta_m, outs)
        if valid is not None:
            w_out = _mask_rows(ctx, w_out, valid)

        if shardable:
            w_repl = jax.device_put(w_table, repl)
            w_int = jax.device_put(_interleave(ctx, w_table, D), wint_shard)
            stacked, claim_p, state, buf, pos = _phase1_sharded(
                ctx, D, w_repl, w_int, w_out, lefts, rights, is_add,
                claim_m, state, buf, pos,
            )
            coeffs1, digests1, rs1, stacked, state, buf, pos = _run_phase_rounds(
                ctx, stacked, state, buf, pos, s, D
            )
            rb_st = jnp.stack(rs1)
            wb_m = stacked[0, 0, 0]
            stacked = _phase2_sharded(
                ctx, D, w_repl, w_int, w_out, rb_st, lefts, rights, is_add, wb_m
            )
            coeffs2, digests2, rs2, stacked, state, buf, pos = _run_phase_rounds(
                ctx, stacked, state, buf, pos, s, D
            )
            rc_st = jnp.stack(rs2)
            wc_m = stacked[1, 1, 0]
        else:
            stacked, claim_p, state, buf, pos = _phase1(
                ctx, w_table, w_out, lefts, rights, is_add, claim_m, state, buf, pos
            )
            coeffs1, digests1, rs1 = [], [], []
            for _ in range(s):
                c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
                coeffs1.append(c)
                digests1.append(dg)
                rs1.append(r)
            rb_st = jnp.stack(rs1)
            wb_m = stacked[0, 0, 0]
            stacked = _phase2(ctx, w_table, w_out, rb_st, lefts, rights, is_add, wb_m)
            coeffs2, digests2, rs2 = [], [], []
            for _ in range(s):
                c, dg, r, stacked, state, buf, pos = _round(ctx, stacked, state, buf, pos)
                coeffs2.append(c)
                digests2.append(dg)
                rs2.append(r)
            rc_st = jnp.stack(rs2)
            wc_m = stacked[1, 1, 0]

        rec = {
            "s": s,
            "claim_p": claim_p,
            "coeffs": jnp.stack(coeffs1 + coeffs2),
            "digests": jnp.stack(digests1 + digests2),
        }
        if layer_index < len(circuit.layers) - 1:
            wb_p, wc_p, alpha_m, beta_m, claim_m, state, buf, pos = _epilogue(
                ctx, wb_m, wc_m, state, buf, pos
            )
            rec["wb_p"] = wb_p
            rec["wc_p"] = wc_p
        records.append(rec)

    layer_proofs, wb_evals, wc_evals, final_claim = _assemble(ctx, records)
    return Proof(
        circuit_output=ev.output,
        claimed_sum=final_claim,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evals,
        wc_evaluations=wc_evals,
    )
