"""Proof (de)serialization.

The reference keeps proofs purely in memory (its ``Proof`` structs derive
only Clone/Debug, ``gkr_protocol.rs:16-23``); a production framework needs
durable, versioned proof bytes.  Format: canonical JSON with hex-encoded
field elements / points -- stable across hosts, independent of limb layout.
"""

from __future__ import annotations

import json
from typing import Any

from ..fields.arith import FieldCtx, field_ctx
from ..poly.multilinear import MultilinearPolynomial
from ..poly.univariate import DenseUnivariatePolynomial
from ..sumcheck.basic import SumcheckProof
from ..sumcheck.gkr_sumcheck import SumcheckProverProof

FORMAT_VERSION = 1


def _hex(x: int) -> str:
    return hex(x)


def _unhex(s: str) -> int:
    return int(s, 16)


def _point(p) -> Any:
    if p is None:
        return None
    return [_hex(p[0]), _hex(p[1])]


def _unpoint(v) -> Any:
    if v is None:
        return None
    return (_unhex(v[0]), _unhex(v[1]))


# -- basic sumcheck -----------------------------------------------------------


def sumcheck_proof_to_json(proof: SumcheckProof) -> str:
    ctx = proof.initial_polynomial.ctx
    return json.dumps(
        {
            "version": FORMAT_VERSION,
            "kind": "sumcheck",
            "field": ctx.name,
            "initial_polynomial": [_hex(v) for v in proof.initial_polynomial.to_ints()],
            "initial_claimed_sum": _hex(proof.initial_claimed_sum),
            "round_univariates": [
                [_hex(v) for v in u.to_ints()]
                for u in proof.round_univariate_polynomials
            ],
        }
    )


def sumcheck_proof_from_json(data: str) -> SumcheckProof:
    obj = json.loads(data)
    assert obj["kind"] == "sumcheck" and obj["version"] == FORMAT_VERSION
    ctx = field_ctx(obj["field"])
    return SumcheckProof(
        initial_polynomial=MultilinearPolynomial.from_ints(
            ctx, [_unhex(v) for v in obj["initial_polynomial"]]
        ),
        initial_claimed_sum=_unhex(obj["initial_claimed_sum"]),
        round_univariate_polynomials=[
            MultilinearPolynomial.from_ints(ctx, [_unhex(v) for v in u])
            for u in obj["round_univariates"]
        ],
    )


# -- GKR / succinct GKR --------------------------------------------------------


def _sumcheck_prover_proof_obj(p: SumcheckProverProof):
    return {
        "claimed_sum": _hex(p.claimed_sum),
        "round_univariates": [[_hex(c) for c in u.coefficients] for u in p.round_univariate_polynomials],
        "random_challenges": [_hex(c) for c in p.random_challenges],
    }


def _sumcheck_prover_proof_from(ctx: FieldCtx, obj) -> SumcheckProverProof:
    return SumcheckProverProof(
        claimed_sum=_unhex(obj["claimed_sum"]),
        round_univariate_polynomials=[
            DenseUnivariatePolynomial(ctx, [_unhex(c) for c in u])
            for u in obj["round_univariates"]
        ],
        random_challenges=[_unhex(c) for c in obj["random_challenges"]],
    )


def gkr_proof_to_json(proof, field_name: str) -> str:
    return json.dumps(
        {
            "version": FORMAT_VERSION,
            "kind": "gkr",
            "field": field_name,
            "circuit_output": [_hex(v) for v in proof.circuit_output],
            "claimed_sum": _hex(proof.claimed_sum),
            "sumcheck_proofs": [_sumcheck_prover_proof_obj(p) for p in proof.sumcheck_proofs],
            "wb_evaluations": [_hex(v) for v in proof.wb_evaluations],
            "wc_evaluations": [_hex(v) for v in proof.wc_evaluations],
        }
    )


def gkr_proof_from_json(data: str):
    from ..gkr.protocol import Proof

    obj = json.loads(data)
    assert obj["kind"] == "gkr" and obj["version"] == FORMAT_VERSION
    ctx = field_ctx(obj["field"])
    return Proof(
        circuit_output=[_unhex(v) for v in obj["circuit_output"]],
        claimed_sum=_unhex(obj["claimed_sum"]),
        sumcheck_proofs=[_sumcheck_prover_proof_from(ctx, p) for p in obj["sumcheck_proofs"]],
        wb_evaluations=[_unhex(v) for v in obj["wb_evaluations"]],
        wc_evaluations=[_unhex(v) for v in obj["wc_evaluations"]],
    )


def succinct_proof_to_json(proof, field_name: str) -> str:
    return json.dumps(
        {
            "version": FORMAT_VERSION,
            "kind": "succinct_gkr",
            "field": field_name,
            "circuit_output": [_hex(v) for v in proof.circuit_output],
            "claimed_sum": _hex(proof.claimed_sum),
            "sumcheck_proofs": [_sumcheck_prover_proof_obj(p) for p in proof.sumcheck_proofs],
            "wb_evaluations": [_hex(v) for v in proof.wb_evaluations],
            "wc_evaluations": [_hex(v) for v in proof.wc_evaluations],
            "input_commitment": _point(proof.input_polynomial_commitment),
            "input_rb_proof": _kzg_proof_obj(proof.input_rb_proof),
            "input_rc_proof": _kzg_proof_obj(proof.input_rc_proof),
        }
    )


def succinct_proof_from_json(data: str):
    from ..gkr.succinct import SuccinctProof

    obj = json.loads(data)
    assert obj["kind"] == "succinct_gkr" and obj["version"] == FORMAT_VERSION
    ctx = field_ctx(obj["field"])
    return SuccinctProof(
        circuit_output=[_unhex(v) for v in obj["circuit_output"]],
        claimed_sum=_unhex(obj["claimed_sum"]),
        sumcheck_proofs=[_sumcheck_prover_proof_from(ctx, p) for p in obj["sumcheck_proofs"]],
        wb_evaluations=[_unhex(v) for v in obj["wb_evaluations"]],
        wc_evaluations=[_unhex(v) for v in obj["wc_evaluations"]],
        input_polynomial_commitment=_unpoint(obj["input_commitment"]),
        input_rb_proof=_kzg_proof_from(obj["input_rb_proof"]),
        input_rc_proof=_kzg_proof_from(obj["input_rc_proof"]),
    )


# -- KZG -----------------------------------------------------------------------


def _kzg_proof_obj(p):
    return {"evaluation": _hex(p.evaluation), "proofs": [_point(q) for q in p.proofs]}


def _kzg_proof_from(obj):
    from ..kzg.multilinear_kzg import MultilinearKZGProof

    return MultilinearKZGProof(
        evaluation=_unhex(obj["evaluation"]),
        proofs=[_unpoint(q) for q in obj["proofs"]],
    )


def kzg_proof_to_json(p) -> str:
    return json.dumps({"version": FORMAT_VERSION, "kind": "kzg", **_kzg_proof_obj(p)})


def kzg_proof_from_json(data: str):
    obj = json.loads(data)
    assert obj["kind"] == "kzg"
    return _kzg_proof_from(obj)
