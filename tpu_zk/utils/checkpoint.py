"""Mid-proof checkpoint / resume for long-running provers.

The reference builds proofs in one call with no persistence (SURVEY.md
section 5, "Checkpoint / resume: none").  At 2^24-scale a prover run is long
enough that elastic restart matters: this module snapshots the full sumcheck
prover state -- round index, the folded device table, the accumulated round
univariates, and the Fiat-Shamir sponge state -- so a proof can resume on a
fresh process (or different host count; the table layout is logical, not
shard-physical) and produce bit-identical output.
"""

from __future__ import annotations

import io
import pickle

import jax
import numpy as np

from ..fields.arith import FieldCtx, field_ctx
from ..poly.multilinear import MultilinearPolynomial, fold, sum_halves
from ..sumcheck.basic import SumcheckProof
from ..transcript.fiat_shamir import Transcript


class CheckpointableSumcheckProver:
    """Basic-sumcheck prover that can pause/resume between rounds.

    Produces transcripts bit-identical to ``sumcheck.basic.Prover``.
    """

    def __init__(self, polynomial: MultilinearPolynomial):
        self.ctx = polynomial.ctx
        self.initial_polynomial = polynomial
        self.initial_claimed_sum = polynomial.sum()
        self.transcript = Transcript()
        self.transcript.append(polynomial.convert_to_bytes())
        self.transcript.append(self.ctx.to_bytes_be(self.initial_claimed_sum))
        self.current = polynomial.table
        self.round = 0
        self.round_polys: list[MultilinearPolynomial] = []

    @property
    def total_rounds(self) -> int:
        return self.initial_polynomial.number_of_variables

    def step(self) -> None:
        """Run one sumcheck round."""
        assert self.round < self.total_rounds
        ctx = self.ctx
        univariate = MultilinearPolynomial(ctx, sum_halves(ctx, self.current))
        self.round_polys.append(univariate)
        self.transcript.append(univariate.convert_to_bytes())
        challenge = self.transcript.random_challenge_as_field_element(ctx)
        self.current = fold(ctx, self.current, 0, ctx.scalar(challenge))
        self.round += 1

    def run(self, max_rounds: int | None = None) -> SumcheckProof | None:
        """Run up to ``max_rounds`` rounds; returns the proof when complete."""
        budget = max_rounds if max_rounds is not None else self.total_rounds
        while self.round < self.total_rounds and budget > 0:
            self.step()
            budget -= 1
        if self.round == self.total_rounds:
            return SumcheckProof(
                initial_polynomial=self.initial_polynomial,
                initial_claimed_sum=self.initial_claimed_sum,
                round_univariate_polynomials=self.round_polys,
            )
        return None

    # -- persistence ---------------------------------------------------------
    def save(self) -> bytes:
        state = {
            "field": self.ctx.name,
            "round": self.round,
            "initial_claimed_sum": self.initial_claimed_sum,
            "initial_table": np.asarray(jax.device_get(self.initial_polynomial.table)),
            "current_table": np.asarray(jax.device_get(self.current)),
            "round_polys": [np.asarray(jax.device_get(u.table)) for u in self.round_polys],
            "transcript": self.transcript.snapshot(),
        }
        buf = io.BytesIO()
        pickle.dump(state, buf)
        return buf.getvalue()

    @classmethod
    def load(cls, blob: bytes) -> "CheckpointableSumcheckProver":
        state = pickle.load(io.BytesIO(blob))
        ctx = field_ctx(state["field"])
        self = cls.__new__(cls)
        self.ctx = ctx
        self.initial_polynomial = MultilinearPolynomial(
            ctx, jax.numpy.asarray(state["initial_table"])
        )
        self.initial_claimed_sum = state["initial_claimed_sum"]
        self.transcript = Transcript.from_snapshot(state["transcript"])
        self.current = jax.numpy.asarray(state["current_table"])
        self.round = state["round"]
        self.round_polys = [
            MultilinearPolynomial(ctx, jax.numpy.asarray(t)) for t in state["round_polys"]
        ]
        return self


class CheckpointableSparseGkrProver:
    """Layer-granular pause/resume for the linear-time (Libra) GKR prover.

    Snapshots the protocol state at a layer boundary: transcript bytes,
    alpha/beta, the previous layer's rb/rc challenges, the running claim,
    and the per-layer proofs emitted so far.  The circuit evaluation tables
    are *recomputed* from the saved inputs on load (one deterministic device
    pass) rather than serialized -- at 2^24 gates the tables are gigabytes
    while the inputs are the only ground truth needed.

    Proof bytes are bit-identical to ``gkr.sparse.prove`` (asserted by
    ``tests/test_utils.py``); the reference has no persistence at all
    (SURVEY.md section 5).
    """

    def __init__(self, circuit, inputs):
        from ..gkr.protocol import _w0_padded

        self.circuit = circuit
        self.ctx = circuit.ctx
        self._inputs_table = (
            inputs if hasattr(inputs, "shape") else self.ctx.array(list(inputs))
        )
        self.ev = circuit.evaluate(self._inputs_table, materialize=False)
        self.transcript = Transcript()
        self.layer_proofs = []
        self.wb_evaluations: list[int] = []
        self.wc_evaluations: list[int] = []
        self.alpha = self.beta = 0
        self.rb_values: list[int] = []
        self.rc_values: list[int] = []
        self.layer = 0

        w0 = _w0_padded(self.ctx, self.ev.output)
        self.transcript.append(w0.convert_to_bytes())
        self.random_challenge_a = self.transcript.random_challenge_as_field_element(self.ctx)
        self.claimed_sum = w0.evaluate([self.random_challenge_a])

    @property
    def total_layers(self) -> int:
        return len(self.circuit.layers)

    def step(self) -> None:
        """Prove one layer (two-phase sparse sumcheck + claim fold)."""
        from ..gkr.sparse import _layer_sumcheck, _out_weights

        assert self.layer < self.total_layers
        ctx = self.ctx
        layer_index = self.layer
        wb_poly = self.circuit.w_i_polynomial(self.ev, layer_index + 1)
        w_out = _out_weights(
            ctx, self.circuit, layer_index, self.random_challenge_a,
            self.alpha, self.beta, self.rb_values, self.rc_values,
        )
        sumcheck_proof = _layer_sumcheck(
            ctx, self.circuit, layer_index, wb_poly, w_out,
            self.claimed_sum, self.transcript,
        )
        self.layer_proofs.append(sumcheck_proof)

        if layer_index < self.total_layers - 1:
            sumcheck_challenges = sumcheck_proof.random_challenges
            middle = len(sumcheck_challenges) // 2
            self.rb_values = sumcheck_challenges[:middle]
            self.rc_values = sumcheck_challenges[middle:]
            wb_evaluation = wb_poly.evaluate(self.rb_values)
            wc_evaluation = wb_poly.evaluate(self.rc_values)
            self.wb_evaluations.append(wb_evaluation)
            self.wc_evaluations.append(wc_evaluation)
            self.transcript.append(ctx.to_bytes_be(wb_evaluation))
            self.alpha = self.transcript.random_challenge_as_field_element(ctx)
            self.transcript.append(ctx.to_bytes_be(wc_evaluation))
            self.beta = self.transcript.random_challenge_as_field_element(ctx)
            self.claimed_sum = (
                self.alpha * wb_evaluation + self.beta * wc_evaluation
            ) % ctx.p
        self.layer += 1

    def run(self, max_layers: int | None = None):
        """Prove up to ``max_layers`` more layers; Proof when complete."""
        from ..gkr.protocol import Proof

        budget = max_layers if max_layers is not None else self.total_layers
        while self.layer < self.total_layers and budget > 0:
            self.step()
            budget -= 1
        if self.layer == self.total_layers:
            return Proof(
                circuit_output=self.ev.output,
                claimed_sum=self.claimed_sum,
                sumcheck_proofs=self.layer_proofs,
                wb_evaluations=self.wb_evaluations,
                wc_evaluations=self.wc_evaluations,
            )
        return None

    # -- persistence ---------------------------------------------------------
    def save(self) -> bytes:
        proofs = [
            (
                p.claimed_sum,
                [q.coefficients for q in p.round_univariate_polynomials],
                list(p.random_challenges),
            )
            for p in self.layer_proofs
        ]
        state = {
            "field": self.ctx.name,
            "layer": self.layer,
            "inputs": np.asarray(jax.device_get(self._inputs_table)),
            "proofs": proofs,
            "wb": self.wb_evaluations,
            "wc": self.wc_evaluations,
            "alpha": self.alpha,
            "beta": self.beta,
            "rb": self.rb_values,
            "rc": self.rc_values,
            "ra": self.random_challenge_a,
            "claimed_sum": self.claimed_sum,
            "transcript": self.transcript.snapshot(),
        }
        buf = io.BytesIO()
        pickle.dump(state, buf)
        return buf.getvalue()

    @classmethod
    def load(cls, circuit, blob: bytes) -> "CheckpointableSparseGkrProver":
        from ..poly.univariate import DenseUnivariatePolynomial
        from ..sumcheck.gkr_sumcheck import SumcheckProverProof

        state = pickle.load(io.BytesIO(blob))
        ctx = field_ctx(state["field"])
        assert circuit.ctx is ctx, "circuit field must match checkpoint"
        self = cls.__new__(cls)
        self.circuit = circuit
        self.ctx = ctx
        self._inputs_table = jax.numpy.asarray(state["inputs"])
        self.ev = circuit.evaluate(self._inputs_table, materialize=False)
        self.layer_proofs = [
            SumcheckProverProof(
                claimed_sum=cs,
                round_univariate_polynomials=[
                    DenseUnivariatePolynomial(ctx, c) for c in coeffs
                ],
                random_challenges=ch,
            )
            for cs, coeffs, ch in state["proofs"]
        ]
        self.wb_evaluations = state["wb"]
        self.wc_evaluations = state["wc"]
        self.alpha = state["alpha"]
        self.beta = state["beta"]
        self.rb_values = state["rb"]
        self.rc_values = state["rc"]
        self.random_challenge_a = state["ra"]
        self.claimed_sum = state["claimed_sum"]
        self.transcript = Transcript.from_snapshot(state["transcript"])
        self.layer = state["layer"]
        return self
