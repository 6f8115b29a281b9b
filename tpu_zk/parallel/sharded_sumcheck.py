"""Multi-device sumcheck: the 2^n evaluation table sharded across a mesh.

Layout (SURVEY.md section 2 parallelism table, row "multilinear fold"): the
table is stored as ``[D, N/D, L]`` with the *low* ``log2(D)`` index bits as
the sharded axis.  Because the sumcheck always folds the most-significant
variable, every fold pairs elements whose low bits agree -- i.e. both pair
members live on the same shard -- so all folds down to local size 1 are
shard-local with zero communication.  The per-round half-sums are per-shard
partial sums followed by one ``psum`` (inserted automatically by GSPMD from
the sharding annotations; modular addition is associative so reduction order
cannot change the transcript).

The last ``log2(D)`` rounds operate on a D-element table: it is gathered to
the host (trivially small) and finished with the plain single-device code,
keeping proofs bit-identical to the unsharded prover and the Rust reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.multilinear import MultilinearPolynomial, fold, sum_halves
from ..sumcheck.basic import SumcheckProof
from ..transcript.fiat_shamir import Transcript
from .mesh import shard_leading


@functools.partial(jax.jit, static_argnums=(0,))
def _sharded_half_sums(ctx: FieldCtx, table: jnp.ndarray) -> jnp.ndarray:
    """[D, M, L] -> [2, L]: per-shard half sums then cross-shard reduction."""
    D, M, L = table.shape
    halves = table.reshape(D, 2, M // 2, L)
    local = arith.sum_mod(ctx, halves, axis=2)  # [D, 2, L] shard-local
    return arith.sum_mod(ctx, local, axis=0)  # cross-shard (psum via GSPMD)


@functools.partial(jax.jit, static_argnums=(0,))
def _sharded_fold(ctx: FieldCtx, table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """[D, M, L] -> [D, M/2, L]: fold the top logical variable, shard-local."""
    return fold(ctx, table, 0, r)


def to_sharded_layout(ctx: FieldCtx, table: jnp.ndarray, mesh) -> jnp.ndarray:
    """[N, L] logical table -> [D, N/D, L] low-bits-sharded layout."""
    D = mesh.devices.size
    N = table.shape[0]
    assert N % D == 0 and N >= 2 * D
    t = table.reshape(N // D, D, ctx.L).transpose(1, 0, 2)
    return shard_leading(mesh, t)


class ShardedProver:
    """Drop-in multi-device basic-sumcheck prover (bit-identical proofs)."""

    def __init__(self, polynomial: MultilinearPolynomial, mesh):
        self.ctx = polynomial.ctx
        self.mesh = mesh
        self.initial_polynomial = polynomial
        self.sharded = to_sharded_layout(self.ctx, polynomial.table, mesh)
        self.initial_claimed_sum = self.ctx.to_ints(
            arith.sum_mod(self.ctx, self.sharded.reshape(-1, self.ctx.L))
        )
        self.transcript = Transcript()

    def prove(self) -> SumcheckProof:
        ctx = self.ctx
        self.transcript.append(self.initial_polynomial.convert_to_bytes())
        self.transcript.append(ctx.to_bytes_be(self.initial_claimed_sum))

        current = self.sharded  # [D, M, L]
        round_polys = []
        n = self.initial_polynomial.number_of_variables
        for _ in range(n):
            if current.ndim == 3 and current.shape[1] > 1:
                univ_limbs = _sharded_half_sums(ctx, current)
            else:
                if current.ndim == 3:
                    # local size 1: remaining logical table = the shard axis
                    # (low index bits ARE the remaining variables, and the
                    # interleaved layout makes shard s hold logical index s)
                    current = current.reshape(-1, ctx.L)
                univ_limbs = sum_halves(ctx, current)
            univariate = MultilinearPolynomial(ctx, univ_limbs)
            round_polys.append(univariate)
            self.transcript.append(univariate.convert_to_bytes())
            challenge = self.transcript.random_challenge_as_field_element(ctx)
            r = ctx.scalar(challenge)
            if current.ndim == 3:
                current = _sharded_fold(ctx, current, r)
            else:
                current = fold(ctx, current, 0, r)

        return SumcheckProof(
            initial_polynomial=self.initial_polynomial,
            initial_claimed_sum=self.initial_claimed_sum,
            round_univariate_polynomials=round_polys,
        )
