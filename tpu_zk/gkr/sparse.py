"""Linear-time (Libra-style) GKR prover/verifier over sparse wiring.

The dense pipeline (``protocol.py``) materializes each layer's add_i/mul_i
indicator MLE of size ``2^(3i+2)`` (reference ``arithmetic_circuit.rs:126-163``)
and an ``|wb| x |wc|`` tensor working set -- both explode past ~2^8-wide
layers and make a 2^24-gate circuit (BASELINE config 5) unreachable.

This module replaces that with the standard linear-time GKR algorithm
[Xie et al., "Libra", 2019]: the layer sumcheck over (b, c) runs in two
phases, each over only ``s = log(width)`` variables, with bookkeeping tables
of size ``width`` built from the sparse gate list in O(gates) device work
(one eq-table build + gathers + a segment-sum per table).

Phase 1 (variables b):   sum_c f(b,c) = w(b)*(A1(b) + M1(b)) + A2(b)
    A1[l] += W_out[g]             (add gates)     A1 = sum_c add(.,b,c)
    A2[l] += W_out[g]*w[r_g]      (add gates)     A2 = sum_c add(.,b,c) w(c)
    M1[l] += W_out[g]*w[r_g]      (mul gates)     M1 = sum_c mul(.,b,c) w(c)
Phase 2 (variables c, b* fixed):
         f(b*,c) = A'(c)*(w(b*) + w(c)) + (M'(c)*w(b*)) * w(c)
    A'[r] += W_out[g]*eq(b*, l_g)  (add gates),  M' likewise (mul gates)

where ``W_out[g] = eq(ra, out_g)`` for layer 0 and
``alpha*eq(rb, out_g) + beta*eq(rc, out_g)`` for deeper layers -- exactly the
dense pipeline's folded wiring, evaluated sparsely.

Every round univariate equals the dense pipeline's value (the phase split
just computes the same partial sums analytically), so **proof bytes and
transcripts are bit-identical to ``protocol.prove``** -- tests assert
equality on the reference circuits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.layered import ADD, Circuit
from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.composed import ProductPolynomial, SumPolynomial
from ..poly.multilinear import MultilinearPolynomial
from ..sumcheck import gkr_sumcheck
from ..transcript.fiat_shamir import Transcript
from .protocol import Proof, _w0_padded


# ---------------------------------------------------------------------------
# device building blocks
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_table_from(ctx: FieldCtx, rs: jnp.ndarray) -> jnp.ndarray:
    """rs [k, L] Montgomery -> [2^k, L] eq table, one device program."""
    t = ctx.one_mont[None, :]
    for i in range(rs.shape[0]):
        r_m = rs[i]
        one_minus = arith.sub(ctx, ctx.one_mont, r_m)
        lo = arith.mont_mul(ctx, t, one_minus)
        hi = arith.mont_mul(ctx, t, r_m)
        # new variable is less significant than all processed ones
        t = jnp.stack([lo, hi], axis=1).reshape(-1, ctx.L)
    return t


def _mont_points(ctx: FieldCtx, challenges) -> jnp.ndarray:
    return jnp.stack([ctx.scalar(int(r)) for r in challenges]) if challenges else jnp.zeros((0, ctx.L), jnp.uint32)


def eq_table(ctx: FieldCtx, challenges: list[int]) -> jnp.ndarray:
    """[2^k, L] Montgomery eq(r, x) over the hypercube; variable 0 = MSB
    (matching the fold convention of ``poly.multilinear``).

    Built in ONE device program per k -- the per-challenge dispatch version
    costs 3 tunnel round trips per variable (~5 s at 20 variables)."""
    if not challenges:
        return ctx.one_mont[None, :]
    return _eq_table_from(ctx, _mont_points(ctx, challenges))


def mont_segment_sum(ctx: FieldCtx, vals: jnp.ndarray, idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Sum Montgomery values [G, L] into ``size`` buckets by index (exact).

    Lazy u32 limb sums (safe for <= 2^16 values per bucket), one carry
    propagation, wide Montgomery reduction back to canonical Montgomery form
    -- the same accumulation shape as circuit layer evaluation."""
    lazy = jax.ops.segment_sum(vals, idx, num_segments=size)
    wide = arith.carry_propagate(lazy, ctx.L + 2)
    plain = arith.redc_wide(ctx, wide)
    r2 = jnp.asarray(arith._limbs_of_int(ctx.R2, ctx.L))
    return arith.mont_mul(ctx, plain, r2)


def _ones(ctx: FieldCtx, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(ctx.one_mont, (n, ctx.L))


@functools.partial(jax.jit, static_argnums=(0,))
def _out_weights_fold(ctx: FieldCtx, rb: jnp.ndarray, rc: jnp.ndarray,
                      alpha_m: jnp.ndarray, beta_m: jnp.ndarray, outs: jnp.ndarray) -> jnp.ndarray:
    """alpha*eq(rb, out) + beta*eq(rc, out) per gate, one device program."""
    eq_rb = _eq_table_from(ctx, rb)
    eq_rc = _eq_table_from(ctx, rc)
    a = arith.mont_mul(ctx, eq_rb, alpha_m)
    b = arith.mont_mul(ctx, eq_rc, beta_m)
    return arith.add(ctx, a, b)[outs]


def _out_weights(ctx: FieldCtx, circuit: Circuit, layer_index: int, ra, alpha, beta,
                 rb_values, rc_values) -> jnp.ndarray:
    """W_out gathered at each gate's output index: the sparse equivalent of
    the dense pipeline's folded add_i/mul_i 'a' variables."""
    layer = circuit.layers[layer_index]
    outs = jnp.asarray(layer.outs)
    if layer_index == 0:
        tbl = eq_table(ctx, [ra])  # layer-0 output variable is 1 bit
        return tbl[outs]
    return _out_weights_fold(
        ctx,
        _mont_points(ctx, rb_values),
        _mont_points(ctx, rc_values),
        ctx.scalar(int(alpha)),
        ctx.scalar(int(beta)),
        outs,
    )


@functools.partial(jax.jit, static_argnums=(0, 5))
def _phase1_tables_jit(ctx: FieldCtx, w_table: jnp.ndarray, w_out: jnp.ndarray,
                       lefts: jnp.ndarray, rights: jnp.ndarray, S: int, is_add: jnp.ndarray):
    """(A1 + M1, A2) of size S from the sparse gate list, one device program."""
    wr = arith.mont_mul(ctx, w_out, w_table[rights])  # W_out * w(c) per gate
    zero = jnp.zeros_like(wr)
    a1 = mont_segment_sum(ctx, jnp.where(is_add, w_out, zero), lefts, S)
    m1 = mont_segment_sum(ctx, jnp.where(is_add, zero, wr), lefts, S)
    a2 = mont_segment_sum(ctx, jnp.where(is_add, wr, zero), lefts, S)
    return arith.add(ctx, a1, m1), a2


def _phase1_tables(ctx: FieldCtx, circuit: Circuit, layer_index: int, w_table: jnp.ndarray,
                   w_out: jnp.ndarray):
    layer = circuit.layers[layer_index]
    return _phase1_tables_jit(
        ctx, w_table, w_out,
        jnp.asarray(layer.lefts), jnp.asarray(layer.rights),
        w_table.shape[0], jnp.asarray(layer.ops == ADD)[:, None],
    )


@functools.partial(jax.jit, static_argnums=(0, 5))
def _phase2_tables_jit(ctx: FieldCtx, w_out: jnp.ndarray, b_star: jnp.ndarray,
                       lefts: jnp.ndarray, rights: jnp.ndarray, size: int, is_add: jnp.ndarray):
    """(A', M') of size S with eq(b*, left) folded in, one device program."""
    eq_b = _eq_table_from(ctx, b_star)[lefts]
    w_eq = arith.mont_mul(ctx, w_out, eq_b)
    zero = jnp.zeros_like(w_eq)
    return (
        mont_segment_sum(ctx, jnp.where(is_add, w_eq, zero), rights, size),
        mont_segment_sum(ctx, jnp.where(is_add, zero, w_eq), rights, size),
    )


def _phase2_tables(ctx: FieldCtx, circuit: Circuit, layer_index: int, w_out: jnp.ndarray,
                   b_star: list[int], size: int):
    layer = circuit.layers[layer_index]
    return _phase2_tables_jit(
        ctx, w_out, _mont_points(ctx, b_star),
        jnp.asarray(layer.lefts), jnp.asarray(layer.rights),
        size, jnp.asarray(layer.ops == ADD)[:, None],
    )


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def _layer_sumcheck(ctx: FieldCtx, circuit: Circuit, layer_index: int,
                    wb_poly: MultilinearPolynomial, w_out: jnp.ndarray,
                    claimed_sum: int, transcript: Transcript, fused: bool = True):
    """One layer's (b, c) sumcheck in two phases; returns the merged proof
    (bit-identical to the dense pipeline's single 2s-variable sumcheck)."""
    w_table = wb_poly.table
    S = w_table.shape[0]

    a1m1, a2 = _phase1_tables(ctx, circuit, layer_index, w_table, w_out)
    h1 = SumPolynomial.from_products([
        ProductPolynomial(ctx, jnp.stack([w_table, a1m1])),
        ProductPolynomial(ctx, jnp.stack([a2, _ones(ctx, S)])),
    ])
    ph1 = gkr_sumcheck.prove(h1, claimed_sum, transcript, fused=fused)

    b_star = ph1.random_challenges
    wb_star = wb_poly.evaluate(b_star)
    a_p, m_p = _phase2_tables(ctx, circuit, layer_index, w_out, b_star, S)
    wb_m = ctx.scalar(wb_star)
    w_plus = arith.add(ctx, w_table, wb_m)  # w(b*) + w(c) elementwise
    m_scaled = arith.mont_mul(ctx, m_p, wb_m)  # M'(c) * w(b*)
    h2 = SumPolynomial.from_products([
        ProductPolynomial(ctx, jnp.stack([a_p, w_plus])),
        ProductPolynomial(ctx, jnp.stack([m_scaled, w_table])),
    ])
    ph2 = gkr_sumcheck.prove(h2, claimed_sum, transcript, fused=fused, absorb_claim=False)

    return gkr_sumcheck.SumcheckProverProof(
        claimed_sum=claimed_sum,
        round_univariate_polynomials=(
            ph1.round_univariate_polynomials + ph2.round_univariate_polynomials
        ),
        random_challenges=ph1.random_challenges + ph2.random_challenges,
    )


def prove(circuit: Circuit, inputs, fused: bool = True) -> Proof:
    """Linear-time GKR prove; same Proof type and bytes as ``protocol.prove``.

    ``inputs`` may be a host int list or a device ``[N, L]`` Montgomery table
    (the practical form at 2^20+ inputs)."""
    ctx = circuit.ctx
    vals = inputs if hasattr(inputs, "shape") else list(inputs)
    circuit_evaluation = circuit.evaluate(vals, materialize=False)

    transcript = Transcript()
    layer_proofs = []
    wb_evaluations: list[int] = []
    wc_evaluations: list[int] = []
    alpha = beta = 0
    rb_values: list[int] = []
    rc_values: list[int] = []
    random_challenge_a = 0

    w0_polynomial = _w0_padded(ctx, circuit_evaluation.output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        wb_poly = circuit.w_i_polynomial(circuit_evaluation, layer_index + 1)
        w_out = _out_weights(
            ctx, circuit, layer_index, random_challenge_a, alpha, beta, rb_values, rc_values
        )
        sumcheck_proof = _layer_sumcheck(
            ctx, circuit, layer_index, wb_poly, w_out, claimed_sum, transcript, fused
        )
        layer_proofs.append(sumcheck_proof)

        if layer_index < len(circuit.layers) - 1:
            sumcheck_challenges = sumcheck_proof.random_challenges
            middle = len(sumcheck_challenges) // 2
            rb_values = sumcheck_challenges[:middle]
            rc_values = sumcheck_challenges[middle:]
            wb_evaluation = wb_poly.evaluate(rb_values)
            wc_evaluation = wb_poly.evaluate(rc_values)
            wb_evaluations.append(wb_evaluation)
            wc_evaluations.append(wc_evaluation)

            transcript.append(ctx.to_bytes_be(wb_evaluation))
            alpha = transcript.random_challenge_as_field_element(ctx)
            transcript.append(ctx.to_bytes_be(wc_evaluation))
            beta = transcript.random_challenge_as_field_element(ctx)
            claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    return Proof(
        circuit_output=circuit_evaluation.output,
        claimed_sum=claimed_sum,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evaluations,
        wc_evaluations=wc_evaluations,
    )


def prove_succinct(circuit: Circuit, inputs, trusted_setup, fused: bool = True):
    """Succinct GKR (KZG-committed inputs) on the linear-time prover.

    Same proof type / transcript bytes as ``succinct.prove_succinct``
    (``gkr/src/succinct_gkr_protocol.rs:35-169``), but every layer runs the
    two-phase sparse sumcheck, so 2^20+-input circuits never materialize a
    dense wiring table.  ``inputs`` may be a host int list or a device
    ``[N, L]`` Montgomery table.
    """
    from ..kzg import multilinear_kzg
    from .succinct import SuccinctProof

    ctx = circuit.ctx
    vals = inputs if hasattr(inputs, "shape") else list(inputs)
    circuit_evaluation = circuit.evaluate(vals, materialize=False)

    input_polynomial = (
        MultilinearPolynomial(ctx, vals)
        if hasattr(vals, "shape")
        else MultilinearPolynomial.from_ints(ctx, vals)
    )
    input_commitment = multilinear_kzg.commit_to_polynomial(input_polynomial, trusted_setup)

    transcript = Transcript()
    layer_proofs = []
    wb_evaluations: list[int] = []
    wc_evaluations: list[int] = []
    alpha = beta = 0
    rb_values: list[int] = []
    rc_values: list[int] = []

    w0_polynomial = _w0_padded(ctx, circuit_evaluation.output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        wb_poly = circuit.w_i_polynomial(circuit_evaluation, layer_index + 1)
        w_out = _out_weights(
            ctx, circuit, layer_index, random_challenge_a, alpha, beta, rb_values, rc_values
        )
        sumcheck_proof = _layer_sumcheck(
            ctx, circuit, layer_index, wb_poly, w_out, claimed_sum, transcript, fused
        )
        layer_proofs.append(sumcheck_proof)

        # rb/rc retained from EVERY layer incl. the last (succinct_gkr :119-126)
        sumcheck_challenges = sumcheck_proof.random_challenges
        middle = len(sumcheck_challenges) // 2
        rb_values = sumcheck_challenges[:middle]
        rc_values = sumcheck_challenges[middle:]

        if layer_index < len(circuit.layers) - 1:
            wb_evaluation = wb_poly.evaluate(rb_values)
            wc_evaluation = wb_poly.evaluate(rc_values)
            wb_evaluations.append(wb_evaluation)
            wc_evaluations.append(wc_evaluation)

            transcript.append(ctx.to_bytes_be(wb_evaluation))
            alpha = transcript.random_challenge_as_field_element(ctx)
            transcript.append(ctx.to_bytes_be(wc_evaluation))
            beta = transcript.random_challenge_as_field_element(ctx)
            claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    input_rb_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rb_values)
    input_rc_proof = multilinear_kzg.open_and_prove(input_polynomial, trusted_setup, rc_values)

    return SuccinctProof(
        circuit_output=circuit_evaluation.output,
        claimed_sum=claimed_sum,
        sumcheck_proofs=layer_proofs,
        wb_evaluations=wb_evaluations,
        wc_evaluations=wc_evaluations,
        input_polynomial_commitment=input_commitment,
        input_rb_proof=input_rb_proof,
        input_rc_proof=input_rc_proof,
    )


def verify_succinct(circuit: Circuit, proof, trusted_setup) -> bool:
    """Sparse-wiring verify of a succinct proof + the two KZG opening checks
    (``gkr/src/succinct_gkr_protocol.rs:172-284``)."""
    from ..kzg import multilinear_kzg

    ctx = circuit.ctx
    transcript = Transcript()
    alpha = beta = 0
    prev_challenges: list[int] = []

    w0_polynomial = _w0_padded(ctx, proof.circuit_output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        if claimed_sum != proof.sumcheck_proofs[layer_index].claimed_sum % ctx.p:
            return False
        verify_result = gkr_sumcheck.verify(
            proof.sumcheck_proofs[layer_index], transcript, ctx
        )
        if not verify_result.is_proof_valid:
            return False
        sumcheck_challenges = verify_result.random_challenges

        wb_evaluation = 0
        wc_evaluation = 0
        if layer_index < len(circuit.layers) - 1:
            wb_evaluation = proof.wb_evaluations[layer_index]
            wc_evaluation = proof.wc_evaluations[layer_index]

            mid = len(prev_challenges) // 2
            w_out = _out_weights(
                ctx, circuit, layer_index, random_challenge_a, alpha, beta,
                prev_challenges[:mid], prev_challenges[mid:],
            )
            add_r, mul_r = _sparse_wiring_eval(
                ctx, circuit, layer_index, w_out, sumcheck_challenges
            )
            expected_claim = (
                add_r * (wb_evaluation + wc_evaluation)
                + mul_r * (wb_evaluation * wc_evaluation)
            ) % ctx.p
            if expected_claim != verify_result.last_claimed_sum:
                return False

        prev_challenges = list(sumcheck_challenges)
        transcript.append(ctx.to_bytes_be(wb_evaluation))
        alpha = transcript.random_challenge_as_field_element(ctx)
        transcript.append(ctx.to_bytes_be(wc_evaluation))
        beta = transcript.random_challenge_as_field_element(ctx)
        claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    mid = len(prev_challenges) // 2
    rb_values = prev_challenges[:mid]
    rc_values = prev_challenges[mid:]
    return multilinear_kzg.verify(
        trusted_setup, proof.input_polynomial_commitment, rb_values, proof.input_rb_proof
    ) and multilinear_kzg.verify(
        trusted_setup, proof.input_polynomial_commitment, rc_values, proof.input_rc_proof
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _wiring_eval_jit(ctx: FieldCtx, w_out, rb, rc, lefts, rights, is_add):
    eq_b = _eq_table_from(ctx, rb)[lefts]
    eq_c = _eq_table_from(ctx, rc)[rights]
    per_gate = arith.mont_mul(ctx, arith.mont_mul(ctx, w_out, eq_b), eq_c)
    zero = jnp.zeros_like(per_gate)
    add_sum = arith.sum_mod(ctx, jnp.where(is_add, per_gate, zero), axis=0)
    mul_sum = arith.sum_mod(ctx, jnp.where(is_add, zero, per_gate), axis=0)
    return add_sum, mul_sum


def _sparse_wiring_eval(ctx: FieldCtx, circuit: Circuit, layer_index: int,
                        w_out: jnp.ndarray, bc_challenges: list[int]):
    """(add_eval, mul_eval) of the folded wiring at the sumcheck point,
    straight from the gate list: O(width + gates), never a dense table."""
    layer = circuit.layers[layer_index]
    half = len(bc_challenges) // 2
    add_sum, mul_sum = _wiring_eval_jit(
        ctx, w_out,
        _mont_points(ctx, bc_challenges[:half]),
        _mont_points(ctx, bc_challenges[half:]),
        jnp.asarray(layer.lefts), jnp.asarray(layer.rights),
        jnp.asarray(layer.ops == ADD)[:, None],
    )
    return ctx.to_ints(add_sum), ctx.to_ints(mul_sum)


def verify(circuit: Circuit, proof: Proof, inputs) -> bool:
    """GKR verify with O(gates) wiring evaluations (no dense 2^(3i+2) tables)."""
    ctx = circuit.ctx
    transcript = Transcript()
    alpha = beta = 0
    prev_challenges: list[int] = []

    w0_polynomial = _w0_padded(ctx, proof.circuit_output)
    transcript.append(w0_polynomial.convert_to_bytes())
    random_challenge_a = transcript.random_challenge_as_field_element(ctx)
    claimed_sum = w0_polynomial.evaluate([random_challenge_a])

    for layer_index in range(len(circuit.layers)):
        if claimed_sum != proof.sumcheck_proofs[layer_index].claimed_sum % ctx.p:
            return False
        verify_result = gkr_sumcheck.verify(
            proof.sumcheck_proofs[layer_index], transcript, ctx
        )
        if not verify_result.is_proof_valid:
            return False
        sumcheck_challenges = verify_result.random_challenges

        if layer_index < len(circuit.layers) - 1:
            wb_evaluation = proof.wb_evaluations[layer_index]
            wc_evaluation = proof.wc_evaluations[layer_index]
        else:
            if hasattr(inputs, "shape"):
                wb_poly = MultilinearPolynomial(ctx, inputs)
            else:
                wb_poly = MultilinearPolynomial.from_ints(ctx, list(inputs))
            middle = len(sumcheck_challenges) // 2
            wb_evaluation = wb_poly.evaluate(sumcheck_challenges[:middle])
            wc_evaluation = wb_poly.evaluate(sumcheck_challenges[middle:])

        mid = len(prev_challenges) // 2
        w_out = _out_weights(
            ctx, circuit, layer_index, random_challenge_a, alpha, beta,
            prev_challenges[:mid], prev_challenges[mid:],
        )
        add_r, mul_r = _sparse_wiring_eval(
            ctx, circuit, layer_index, w_out, sumcheck_challenges
        )
        expected_claim = (
            add_r * (wb_evaluation + wc_evaluation)
            + mul_r * (wb_evaluation * wc_evaluation)
        ) % ctx.p
        if expected_claim != verify_result.last_claimed_sum:
            return False

        prev_challenges = list(sumcheck_challenges)
        transcript.append(ctx.to_bytes_be(wb_evaluation))
        alpha = transcript.random_challenge_as_field_element(ctx)
        transcript.append(ctx.to_bytes_be(wc_evaluation))
        beta = transcript.random_challenge_as_field_element(ctx)
        claimed_sum = (alpha * wb_evaluation + beta * wc_evaluation) % ctx.p

    return True
