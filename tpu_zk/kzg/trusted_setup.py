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

import functools
import secrets

import jax
import jax.numpy as jnp

from ..curves.ec_device import DeviceCurve, Point, batch_scalar_mul, ec_add, scalar_bits
from ..curves.fixed_base import digits4, fixed_base_msm, host_window_table
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
        self._folded_g1 = None

    @classmethod
    def initialize_setup(cls, curve_name: str, taus: list[int]) -> "TrustedSetup":
        assert len(taus) > 0, "requires at least one variable"
        dc = DeviceCurve(curve_name)
        fr = dc.fr

        basis = compute_lagrange_basis_device(fr, [t % fr.p for t in taus])
        plain = arith.from_mont(fr, basis)
        # shared base G -> windowed fixed-base kernel (one gather + one wide
        # complete add per 4-bit window) instead of per-point double-and-add
        table = host_window_table(dc, fr.L * 16)
        g1_powers = fixed_base_msm(dc.ctx, dc.b3, table, digits4(plain))

        g2_gen = dc.host.g2_generator()
        g2_powers = [dc.host.g2_mul(g2_gen, t % fr.p) for t in taus]

        return cls(dc, g1_powers, g2_powers, len(taus))

    def lagrange_basis_ints(self):
        """Host view of the committed G1 powers (affine int pairs)."""
        return self.curve.points_to_host(self.g1_powers_of_tau)

    def folded_g1_bases(self) -> list[Point]:
        """Aggregated bases for ``open_and_prove``'s blown-up quotient MSMs.

        The reference (``multilinear_kzg.rs:181-209``) duplicates quotient i
        to full length 2^n and MSMs against all g1 powers; since
        ``blown[j] = q[j mod len]``, that MSM equals an MSM of the *short*
        quotient against H_i[k] = sum_r g1[r*len_i + k].  The H_i chain is a
        halving cascade of complete adds (N total, one device program),
        computed once per setup and reused by every open.
        """
        if self._folded_g1 is None:
            dc = self.curve
            self._folded_g1 = list(
                _fold_chain(dc.ctx, dc.b3, self.g1_powers_of_tau, self.num_vars)
            )
        return self._folded_g1


@functools.partial(jax.jit, static_argnums=(0, 3))
def _fold_chain(ctx, b3, P: Point, n_steps: int):
    out = []
    cur = P
    for _ in range(n_steps):
        half = cur[0].shape[0] // 2
        lo = tuple(c[:half] for c in cur)
        hi = tuple(c[half:] for c in cur)
        cur = ec_add(ctx, b3, lo, hi)
        out.append(cur)
    return tuple(out)


def generate_values_for_tau(curve_name: str, number_of_variables: int) -> list[int]:
    dc = DeviceCurve(curve_name)
    return [secrets.randbelow(dc.fr.p) for _ in range(number_of_variables)]
