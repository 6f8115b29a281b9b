"""Multilinear KZG: commit (MSM), open/prove (quotient chain + MSMs),
pairing verification.

Reference parity: ``multilinear_kzg/src/multilinear_kzg.rs`` --
commit_to_polynomial :25-45 (MSM against the G1 Lagrange powers),
open_and_prove :50-126 (per variable: quotient = top-minus-bottom half :165-179,
blow-up duplication :181-209, MSM proof :100-107, fold remainder :113-119),
verify :131-158 (pairing product check
``e(C - v g1, g2) == sum_i e(Q_i, tau_i g2 - x_i g2)``).

TPU-native: quotients / blow-ups / folds are table kernels; each proof is one
device MSM; only the O(n)-pairing verify runs on the host.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..curves.ec_device import ec_identity, msm, scalar_bits
from ..curves.msm_pippenger import msm_pippenger
from ..curves.host_ec import ec_neg
from ..curves.pairing_native import pairing_product_is_one  # native C++, py fallback
from ..fields import arith
from ..poly.multilinear import MultilinearPolynomial
from .trusted_setup import TrustedSetup


@dataclass
class MultilinearKZGProof:
    evaluation: int  # v
    proofs: list  # affine G1 int pairs (or None), one per variable


# None = auto (pad on TPU only); tests force True on CPU to cover the padded
# branch, asserting identical proofs (identity points / zero scalars are
# exact no-ops under the complete addition formulas).
PAD_TAIL_MSMS: bool | None = None
_PAD_SHAPE = 2048


def _pad_tail_msms() -> bool:
    if PAD_TAIL_MSMS is not None:
        return PAD_TAIL_MSMS
    return jax.default_backend() == "tpu"


def _padded_size(n: int) -> int:
    """Snap an MSM size to the {2^11, 2^13, 2^15, ...} grid.

    Every Pippenger shape costs a minutes-long compile through the tunnel;
    ``open_and_prove`` at 2^d otherwise compiles d distinct sizes.  The
    power-of-4 grid caps that at d/2 shapes shared across all depths (the
    top quotient MSM of a 2^(2k) open lands exactly on the grid)."""
    if n <= _PAD_SHAPE:
        return _PAD_SHAPE
    e = (n - 1).bit_length()  # next power of two
    if e % 2 == 0:
        e += 1  # odd exponents: 2^11, 2^13, ...
    return 1 << e


def commit_to_polynomial(
    polynomial: MultilinearPolynomial, trusted_setup: TrustedSetup
):
    """-> affine G1 point (host int pair)."""
    dc = trusted_setup.curve
    fr = dc.fr
    assert polynomial.table.shape[0] == trusted_setup.g1_powers_of_tau[0].shape[0], (
        "Polynomial evaluation must match g1 length"
    )
    plain = arith.from_mont(fr, polynomial.table)
    point = msm_pippenger(dc.ctx, dc.b3, (trusted_setup.g1_powers_of_tau, plain))
    return dc.point_to_host(point)


def open_and_prove(
    polynomial: MultilinearPolynomial,
    trusted_setup: TrustedSetup,
    opening_values: list[int],
) -> MultilinearKZGProof:
    dc = trusted_setup.curve
    fr = dc.fr
    n = polynomial.number_of_variables
    assert n == len(opening_values), (
        "number of polynomial variables must match length of opening values"
    )
    assert len(opening_values) == len(trusted_setup.g2_powers_of_tau), (
        "Opening values must match number of variables from trusted setup"
    )

    evaluation_v = polynomial.evaluate(opening_values)

    # f - v
    v_mont = fr.scalar(evaluation_v)
    sub_table = arith.sub(fr, polynomial.table, v_mont)

    from ..poly.multilinear import fold

    # The reference blows each quotient up to full length and MSMs against
    # all g1 powers (multilinear_kzg.rs:100-107,181-209); MSM i here runs the
    # *short* quotient against the precomputed folded bases H_i -- the same
    # group element (sum regrouped by associativity), at 1/n the points.
    folded_bases = trusted_setup.folded_g1_bases()
    proofs = []
    for i, opening in enumerate(opening_values):
        half = sub_table.shape[0] // 2
        quotient = arith.sub(fr, sub_table[half:], sub_table[:half])
        base = folded_bases[i]
        scalars = arith.from_mont(fr, quotient)
        # TPU: pad every MSM up to the shared power-of-4 Pippenger shape grid
        # (identity points + zero scalars add nothing); per-size programs
        # would each cost a minutes-long compile through the tunnel,
        # dwarfing the actual math
        if _pad_tail_msms() and scalars.shape[0] != _padded_size(scalars.shape[0]):
            pad = _padded_size(scalars.shape[0]) - scalars.shape[0]
            ident = ec_identity(dc.ctx)
            base = tuple(
                jnp.concatenate([c, jnp.broadcast_to(z, (pad,) + z.shape)])
                for c, z in zip(base, ident)
            )
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((pad, scalars.shape[1]), jnp.uint32)]
            )
        proof_point = msm_pippenger(dc.ctx, dc.b3, (base, scalars))
        proofs.append(dc.point_to_host(proof_point))
        # remainder: fold the first variable at the opening value
        sub_table = fold(fr, sub_table, 0, fr.scalar(opening))

    return MultilinearKZGProof(evaluation=evaluation_v, proofs=proofs)


def verify(
    trusted_setup: TrustedSetup,
    commitment,
    opening_values: list[int],
    proof: MultilinearKZGProof,
) -> bool:
    assert len(opening_values) == len(proof.proofs), (
        "Number of opening values must match number of proofs"
    )
    dc = trusted_setup.curve
    hc = dc.host

    # LHS: e(C - v g1, g2); moved to the product as e(C - v g1, -g2)
    g1_gen = hc.g1_generator()
    c_proj = (
        hc.zero.__class__(hc.p, commitment[0]),
        hc.zero.__class__(hc.p, commitment[1]),
        hc.one,
    )
    c_minus_v = hc.g1_add(c_proj, ec_neg(hc.g1_mul(g1_gen, proof.evaluation)))
    g2_gen = hc.g2_generator()

    pairs = [(hc.g1_affine(c_minus_v), hc.g2_affine(ec_neg(g2_gen)))]
    for i, tau_g2 in enumerate(trusted_setup.g2_powers_of_tau):
        x_g2 = hc.g2_mul(g2_gen, opening_values[i])
        pairs.append((proof.proofs[i], hc.g2_affine(hc.g2_sub(tau_g2, x_g2))))

    return pairing_product_is_one(dc.name, pairs)
