"""Multilinear KZG trusted setup.

Reference parity: ``multilinear_kzg/src/trusted_setup.rs`` --
``initialize_setup`` :11-22, ``compute_lagrange_basis`` :24-49 (hypercube
index bits MSB-first, bit i selects tau_i vs 1-tau_i),
``compute_g1_powers_of_tau`` :51-62, ``compute_g2_powers_of_tau`` :64-74,
``generate_values_for_tau`` :76-87.

TPU-native: the 2^n Lagrange basis is built by n interleave-and-scale kernel
passes on device, and the G1 powers come from one batched fixed-base
scalar-multiplication kernel.  G2 powers (n tiny points) stay on host.
"""

from __future__ import annotations

import secrets

import jax.numpy as jnp

from ..curves.ec_device import DeviceCurve, batch_scalar_mul, scalar_bits
from ..fields import arith


def compute_lagrange_basis_device(fr, taus: list[int]) -> jnp.ndarray:
    """[2^n, L] Montgomery array of hypercube Lagrange-basis values."""
    basis = fr.array([1])
    for t in taus:
        t_m = fr.scalar(t)
        one_minus_t = fr.scalar((1 - t) % fr.p)
        low = arith.mont_mul(fr, basis, one_minus_t)
        high = arith.mont_mul(fr, basis, t_m)
        basis = jnp.stack([low, high], axis=1).reshape(-1, fr.L)
    return basis


class TrustedSetup:
    def __init__(self, curve: DeviceCurve, g1_powers, g2_powers_host, num_vars: int):
        self.curve = curve
        self.g1_powers_of_tau = g1_powers  # device Point arrays [2^n]
        self.g2_powers_of_tau = g2_powers_host  # host projective G2 points, len n
        self.num_vars = num_vars

    @classmethod
    def initialize_setup(cls, curve_name: str, taus: list[int]) -> "TrustedSetup":
        assert len(taus) > 0, "requires at least one variable"
        dc = DeviceCurve(curve_name)
        fr = dc.fr

        basis = compute_lagrange_basis_device(fr, [t % fr.p for t in taus])
        plain = arith.from_mont(fr, basis)
        bits = scalar_bits(fr, plain)

        g1 = dc.host.g1_affine(dc.host.g1_generator())
        n_points = basis.shape[0]
        base = dc.points_to_device([g1] * n_points)
        g1_powers = batch_scalar_mul(dc.ctx, dc.b3, base, bits)

        g2_gen = dc.host.g2_generator()
        g2_powers = [dc.host.g2_mul(g2_gen, t % fr.p) for t in taus]

        return cls(dc, g1_powers, g2_powers, len(taus))

    def lagrange_basis_ints(self):
        """Host view of the committed G1 powers (affine int pairs)."""
        return self.curve.points_to_host(self.g1_powers_of_tau)


def generate_values_for_tau(curve_name: str, number_of_variables: int) -> list[int]:
    dc = DeviceCurve(curve_name)
    return [secrets.randbelow(dc.fr.p) for _ in range(number_of_variables)]
