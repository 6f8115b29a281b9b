"""Composed (product / sum) polynomials -- the GKR sumcheck working set.

TPU-first layout: a ProductPolynomial is a stacked ``[k, N, L]`` limb array
(k same-size MLE factors), a SumPolynomial is ``[p, k, N, L]``.  Partial
evaluation folds all members in one fused pass over the stacked array;
element-wise collapse is a product over the k axis then a sum over the p
axis.  The reference stores these as Vecs of polynomials
(``polynomials/src/composed/product_polynomial.rs:6-8``,
``sum_polynomial.rs:7-9``); semantics are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import arith
from ..fields.arith import FieldCtx
from .multilinear import MultilinearPolynomial, fold


@functools.partial(jax.jit, static_argnums=(0,))
def collapse_sum_of_products(ctx: FieldCtx, stacked: jnp.ndarray) -> jnp.ndarray:
    """[p, k, N, L] -> [N, L]: elementwise product over k, then sum over p.

    Mirrors ``SumPolynomial::add_polynomials_element_wise``
    (sum_polynomial.rs:57-76) composed with
    ``ProductPolynomial::multiply_polynomials_element_wise``
    (product_polynomial.rs:58-73).
    """
    p, k, N, L = stacked.shape
    prod = stacked[:, 0]
    for j in range(1, k):
        prod = arith.mont_mul(ctx, prod, stacked[:, j])
    acc = prod[0]
    for i in range(1, p):
        acc = arith.add(ctx, acc, prod[i])
    return acc


class ProductPolynomial:
    def __init__(self, ctx: FieldCtx, stacked: jnp.ndarray):
        assert stacked.ndim == 3
        self.ctx = ctx
        self.stacked = stacked  # [k, N, L]

    @classmethod
    def from_mles(cls, polys: list[MultilinearPolynomial]) -> "ProductPolynomial":
        n = polys[0].number_of_variables
        assert all(q.number_of_variables == n for q in polys), "different number of variables"
        return cls(polys[0].ctx, jnp.stack([q.table for q in polys]))

    @property
    def degree(self) -> int:
        return self.stacked.shape[0]

    @property
    def number_of_variables(self) -> int:
        return int(self.stacked.shape[1]).bit_length() - 1

    def evaluate(self, values) -> int:
        t = self.stacked
        for v in values:
            r = self.ctx.scalar(int(v)) if isinstance(v, int) else v
            t = fold(self.ctx, t, 0, r)
        prod = t[0, 0]
        for j in range(1, t.shape[0]):
            prod = arith.mont_mul(self.ctx, prod, t[j, 0])
        return self.ctx.to_ints(prod)

    def partial_evaluate(self, var: int, value) -> "ProductPolynomial":
        r = self.ctx.scalar(int(value)) if isinstance(value, int) else value
        return ProductPolynomial(self.ctx, fold(self.ctx, self.stacked, var, r))

    def multiply_polynomials_element_wise(self) -> MultilinearPolynomial:
        assert self.stacked.shape[0] > 1, "more than one polynomial required for mul operation"
        prod = self.stacked[0]
        for j in range(1, self.stacked.shape[0]):
            prod = arith.mont_mul(self.ctx, prod, self.stacked[j])
        return MultilinearPolynomial(self.ctx, prod)

    def convert_to_bytes(self) -> bytes:
        return b"".join(
            MultilinearPolynomial(self.ctx, self.stacked[j]).convert_to_bytes()
            for j in range(self.stacked.shape[0])
        )

    def mles(self) -> list[MultilinearPolynomial]:
        return [MultilinearPolynomial(self.ctx, self.stacked[j]) for j in range(self.stacked.shape[0])]


class SumPolynomial:
    def __init__(self, ctx: FieldCtx, stacked: jnp.ndarray):
        assert stacked.ndim == 4
        self.ctx = ctx
        self.stacked = stacked  # [p, k, N, L]

    @classmethod
    def from_products(cls, products: list[ProductPolynomial]) -> "SumPolynomial":
        n = products[0].number_of_variables
        assert all(q.number_of_variables == n for q in products), "different number of variables"
        assert all(q.degree == products[0].degree for q in products)
        return cls(products[0].ctx, jnp.stack([q.stacked for q in products]))

    @property
    def degree(self) -> int:
        return self.stacked.shape[1]

    @property
    def number_of_variables(self) -> int:
        return int(self.stacked.shape[2]).bit_length() - 1

    def evaluate(self, values) -> int:
        acc = 0
        for i in range(self.stacked.shape[0]):
            acc = (acc + ProductPolynomial(self.ctx, self.stacked[i]).evaluate(values)) % self.ctx.p
        return acc

    def partial_evaluate(self, var: int, value) -> "SumPolynomial":
        r = self.ctx.scalar(int(value)) if isinstance(value, int) else value
        return SumPolynomial(self.ctx, fold(self.ctx, self.stacked, var, r))

    def add_polynomials_element_wise(self) -> MultilinearPolynomial:
        assert self.stacked.shape[0] > 1, "more than one product polynomial required for add operation"
        return MultilinearPolynomial(self.ctx, collapse_sum_of_products(self.ctx, self.stacked))

    def convert_to_bytes(self) -> bytes:
        return b"".join(
            ProductPolynomial(self.ctx, self.stacked[i]).convert_to_bytes()
            for i in range(self.stacked.shape[0])
        )
