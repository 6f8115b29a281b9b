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
import json

import jax
import numpy as np

from ..fields.arith import FieldCtx, field_ctx  # noqa: F401  (FieldCtx in annotations)


from ..poly.multilinear import MultilinearPolynomial, fold, sum_halves
from ..sumcheck.basic import SumcheckProof
from ..transcript.fiat_shamir import Transcript

CHECKPOINT_FORMAT_VERSION = 2  # v2 = npz+JSON (v1 was pickle; no longer readable)


def _dump_state(arrays: dict, meta: dict) -> bytes:
    """Checkpoint blob = npz of numeric arrays + one JSON metadata entry.

    No pickle anywhere (``allow_pickle=False`` both ways): loading a
    checkpoint from untrusted storage can at worst fail to parse, never
    execute code.  Big field elements travel as hex strings inside the JSON.
    """
    buf = io.BytesIO()
    meta = dict(meta, format_version=CHECKPOINT_FORMAT_VERSION)
    meta_arr = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(buf, __meta__=meta_arr, **arrays)
    return buf.getvalue()


def _load_state(blob: bytes) -> tuple[dict, dict]:
    try:
        with np.load(io.BytesIO(blob), allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
    except Exception as e:
        raise ValueError(
            "unreadable checkpoint: not a v2 npz+JSON blob (checkpoints "
            "written before the npz format -- old pickle blobs -- are not "
            "loadable; re-create the checkpoint)"
        ) from e
    version = meta.get("format_version", 1)
    if version > CHECKPOINT_FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{version} is newer than supported "
            f"v{CHECKPOINT_FORMAT_VERSION}"
        )
    return arrays, meta


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
        arrays = {
            "initial_table": np.asarray(jax.device_get(self.initial_polynomial.table)),
            "current_table": np.asarray(jax.device_get(self.current)),
            "transcript": np.frombuffer(self.transcript.snapshot(), dtype=np.uint8),
        }
        for i, u in enumerate(self.round_polys):
            arrays[f"round_poly_{i}"] = np.asarray(jax.device_get(u.table))
        meta = {
            "field": self.ctx.name,
            "round": self.round,
            "n_round_polys": len(self.round_polys),
            "initial_claimed_sum": hex(self.initial_claimed_sum),
        }
        return _dump_state(arrays, meta)

    @classmethod
    def load(cls, blob: bytes) -> "CheckpointableSumcheckProver":
        arrays, meta = _load_state(blob)
        ctx = field_ctx(meta["field"])
        self = cls.__new__(cls)
        self.ctx = ctx
        self.initial_polynomial = MultilinearPolynomial(
            ctx, jax.numpy.asarray(arrays["initial_table"])
        )
        self.initial_claimed_sum = int(meta["initial_claimed_sum"], 16)
        self.transcript = Transcript.from_snapshot(arrays["transcript"].tobytes())
        self.current = jax.numpy.asarray(arrays["current_table"])
        self.round = meta["round"]
        self.round_polys = [
            MultilinearPolynomial(ctx, jax.numpy.asarray(arrays[f"round_poly_{i}"]))
            for i in range(meta["n_round_polys"])
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
        hx = hex
        proofs = [
            {
                "claimed_sum": hx(p.claimed_sum),
                "coeffs": [[hx(c) for c in q.coefficients] for q in p.round_univariate_polynomials],
                "challenges": [hx(c) for c in p.random_challenges],
            }
            for p in self.layer_proofs
        ]
        arrays = {
            "inputs": np.asarray(jax.device_get(self._inputs_table)),
            "transcript": np.frombuffer(self.transcript.snapshot(), dtype=np.uint8),
        }
        meta = {
            "field": self.ctx.name,
            "layer": self.layer,
            "proofs": proofs,
            "wb": [hx(v) for v in self.wb_evaluations],
            "wc": [hx(v) for v in self.wc_evaluations],
            "alpha": hx(self.alpha),
            "beta": hx(self.beta),
            "rb": [hx(v) for v in self.rb_values],
            "rc": [hx(v) for v in self.rc_values],
            "ra": hx(self.random_challenge_a),
            "claimed_sum": hx(self.claimed_sum),
        }
        return _dump_state(arrays, meta)

    @classmethod
    def load(cls, circuit, blob: bytes) -> "CheckpointableSparseGkrProver":
        from ..poly.univariate import DenseUnivariatePolynomial
        from ..sumcheck.gkr_sumcheck import SumcheckProverProof

        arrays, meta = _load_state(blob)
        ctx = field_ctx(meta["field"])
        assert circuit.ctx is ctx, "circuit field must match checkpoint"
        ih = lambda s: int(s, 16)  # noqa: E731
        self = cls.__new__(cls)
        self.circuit = circuit
        self.ctx = ctx
        self._inputs_table = jax.numpy.asarray(arrays["inputs"])
        self.ev = circuit.evaluate(self._inputs_table, materialize=False)
        self.layer_proofs = [
            SumcheckProverProof(
                claimed_sum=ih(p["claimed_sum"]),
                round_univariate_polynomials=[
                    DenseUnivariatePolynomial(ctx, [ih(c) for c in coeffs])
                    for coeffs in p["coeffs"]
                ],
                random_challenges=[ih(c) for c in p["challenges"]],
            )
            for p in meta["proofs"]
        ]
        self.wb_evaluations = [ih(v) for v in meta["wb"]]
        self.wc_evaluations = [ih(v) for v in meta["wc"]]
        self.alpha = ih(meta["alpha"])
        self.beta = ih(meta["beta"])
        self.rb_values = [ih(v) for v in meta["rb"]]
        self.rc_values = [ih(v) for v in meta["rc"]]
        self.random_challenge_a = ih(meta["ra"])
        self.claimed_sum = ih(meta["claimed_sum"])
        self.transcript = Transcript.from_snapshot(arrays["transcript"].tobytes())
        self.layer = meta["layer"]
        return self
