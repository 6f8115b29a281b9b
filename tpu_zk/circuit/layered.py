"""Layered arithmetic circuits (structure-of-arrays, device evaluation).

TPU-first redesign of the reference's gate-by-gate interpreter
(``circuit/src/arithmetic_circuit.rs:65-109``): each layer stores its gates as
index arrays (lefts / rights / outs / ops), evaluation is a gather of both
input vectors, a vectorized add+mul with a select, and a segment-sum
accumulation into the output slots (the reference's ``+=`` at
``output_index``).  The add_i/mul_i wiring indicators are kept both as sparse
position lists (the scalable representation) and as dense MLE tables matching
the reference's ``add_i_and_mul_i_mle`` (:126-163) packing
``(out | left | right)`` with widths ``(i, i+1, i+1)`` (layer 0: ``(1,1,1)``,
:166-178).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.multilinear import MultilinearPolynomial

ADD = 0
MUL = 1


@dataclass
class Gate:
    left_index: int
    right_index: int
    output_index: int
    operator: int  # ADD or MUL

    @classmethod
    def add(cls, l, r, o):
        return cls(l, r, o, ADD)

    @classmethod
    def mul(cls, l, r, o):
        return cls(l, r, o, MUL)


class Layer:
    def __init__(self, gates: list[Gate]):
        self.gates = gates
        self.lefts = np.array([g.left_index for g in gates], np.int32)
        self.rights = np.array([g.right_index for g in gates], np.int32)
        self.outs = np.array([g.output_index for g in gates], np.int32)
        self.ops = np.array([g.operator for g in gates], np.int32)
        self.width = int(self.outs.max()) + 1 if gates else 1

    @classmethod
    def from_arrays(cls, lefts, rights, outs, ops) -> "Layer":
        """Array-native constructor (no per-gate Python objects) -- the only
        practical way to build 2^20+-gate layers."""
        layer = cls.__new__(cls)
        layer.gates = None
        layer.lefts = np.asarray(lefts, np.int32)
        layer.rights = np.asarray(rights, np.int32)
        layer.outs = np.asarray(outs, np.int32)
        layer.ops = np.asarray(ops, np.int32)
        layer.width = int(layer.outs.max()) + 1 if layer.outs.size else 1
        return layer


@dataclass
class CircuitEvaluationResult:
    output: list[int]
    layer_evaluations: list[list[int]]
    # device-resident Montgomery tables per layer (input layer last)
    layer_tables: list[jnp.ndarray]


class Circuit:
    """layers[0] is the output layer, as in the reference."""

    def __init__(self, ctx: FieldCtx, layers: list[Layer]):
        self.ctx = ctx
        self.layers = layers

    def evaluate(self, values, materialize: bool = True) -> CircuitEvaluationResult:
        """materialize=False skips pulling every layer back as host ints
        (converting 2^24 limb rows to Python ints costs minutes); only the
        output layer is materialized, which is all the protocols need."""
        ctx = self.ctx
        current = values if hasattr(values, "shape") else ctx.array(list(values))
        tables = [current]
        for layer in reversed(self.layers):
            current = _eval_layer(
                ctx,
                current,
                jnp.asarray(layer.lefts),
                jnp.asarray(layer.rights),
                jnp.asarray(layer.outs),
                jnp.asarray(layer.ops),
                layer.width,
            )
            tables.append(current)
        tables.reverse()

        def ints(t):
            return ctx.to_ints(t) if t.shape[0] > 1 else [ctx.to_ints(t)[0]]

        output = ints(tables[0])
        evals = [ints(t) for t in tables] if materialize else [output]
        return CircuitEvaluationResult(
            output=output, layer_evaluations=evals, layer_tables=tables
        )

    # -- wiring MLEs ---------------------------------------------------------
    def gate_positions(self, layer_index: int):
        """Sparse (positions, ops) of the wiring indicators for a layer."""
        layer = self.layers[layer_index]
        i = layer_index
        b_bits = i + 1
        pos = (
            (layer.outs.astype(np.int64) << (2 * b_bits))
            | (layer.lefts.astype(np.int64) << b_bits)
            | layer.rights.astype(np.int64)
        )
        return pos, layer.ops

    def add_i_and_mul_i_mle(self, layer_index: int):
        """Dense indicator MLEs (reference arithmetic_circuit.rs:126-163).

        Size 2^(3i+2) explodes for deep layers; the sparse representation in
        :meth:`gate_positions` is the scalable path -- this dense form exists
        for reference parity and the dense GKR pipeline.
        """
        nv = num_of_layer_variables(layer_index)
        size = 1 << nv
        pos, ops = self.gate_positions(layer_index)
        add_vals = np.zeros(size, np.int64)
        mul_vals = np.zeros(size, np.int64)
        add_vals[pos[ops == ADD]] = 1
        mul_vals[pos[ops == MUL]] = 1
        return (
            MultilinearPolynomial.from_ints(self.ctx, add_vals.tolist()),
            MultilinearPolynomial.from_ints(self.ctx, mul_vals.tolist()),
        )

    def w_i_polynomial(self, circuit_evaluation: CircuitEvaluationResult, layer_index: int):
        assert layer_index < len(circuit_evaluation.layer_tables), "layer index out of bounds"
        return MultilinearPolynomial(self.ctx, circuit_evaluation.layer_tables[layer_index])


import functools


@functools.partial(jax.jit, static_argnums=(0, 6))
def _eval_layer(ctx, current, lefts, rights, outs, ops, width: int):
    left_vals = jnp.take(current, lefts, axis=0)
    right_vals = jnp.take(current, rights, axis=0)
    added = arith.add(ctx, left_vals, right_vals)
    mulled = arith.mont_mul(ctx, left_vals, right_vals)
    results = jnp.where((ops == MUL)[:, None], mulled, added)
    # accumulate at output_index (lazy uint32 sums, then exact reduction)
    lazy = jax.ops.segment_sum(results, outs, num_segments=width)
    wide = arith.carry_propagate(lazy, ctx.L + 2)
    plain = arith.redc_wide(ctx, wide)
    r2 = jnp.asarray(arith._limbs_of_int(ctx.R2, ctx.L))
    return arith.mont_mul(ctx, plain, r2)


def tree_sum_circuit(ctx: FieldCtx, depth: int, op: int = ADD) -> Circuit:
    """Balanced binary reduction circuit: 2^depth inputs, layer i has 2^i
    gates (2^depth - 1 total) -- the BASELINE config-5 scale shape."""
    layers = []
    for i in range(depth):
        n = 1 << i
        idx = np.arange(n, dtype=np.int32)
        layers.append(
            Layer.from_arrays(2 * idx, 2 * idx + 1, idx, np.full(n, op, np.int32))
        )
    return Circuit(ctx, layers)


def num_of_layer_variables(layer_index: int) -> int:
    """Reference arithmetic_circuit.rs:166-178."""
    if layer_index == 0:
        return 3
    return layer_index + 2 * (layer_index + 1)


def convert_to_binary_and_to_decimal(layer_index, variable_a, variable_b, variable_c) -> int:
    """Reference arithmetic_circuit.rs:180-196 packing, arithmetically."""
    b_bits = layer_index + 1
    return (variable_a << (2 * b_bits)) | (variable_b << b_bits) | variable_c
