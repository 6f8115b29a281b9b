"""Whole-proof fused sumcheck: every round, fold, and Fiat-Shamir challenge
in ONE device program.

Through the remote-TPU tunnel a host<->device round trip costs ~35 ms while a
2^20-table round is <5 ms of kernel time, so the host-synced loop (one sync
per round, ``basic_sumcheck/prover.rs:35-71``) is latency-bound by >10x.  The
device-resident Keccak sponge (``transcript.device_fs``) removes the protocol's
only inherent host dependency; what remains is a single jit program that:

  per round: absorb round-univariate BE bytes -> squeeze challenge
             -> fold the table -> half-sums for the next univariate

and returns all round univariates (plain + Montgomery form), the challenge
digests, and the final sponge state in one transfer.  Transcript bytes are
bit-identical to the host path (cross-checked in tests/test_sumcheck.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx
from ..poly.multilinear import fold, sum_halves
from ..transcript.device_fs import DeviceSponge, digest_to_mont, pack_bytes_be
from ..transcript.keccak import RATE


def final_pos(pos: int, n_rounds: int, absorb_bytes: int) -> int:
    """Static buffer fill level after n rounds of (absorb k, squeeze)."""
    for _ in range(n_rounds):
        pos = (pos + absorb_bytes) % RATE
        pos = (pos + 32) % RATE
    return pos


@functools.partial(jax.jit, static_argnums=(0, 4))
def fused_basic_prove(
    ctx: FieldCtx, table: jnp.ndarray, state: jnp.ndarray, buf: jnp.ndarray, pos: int
):
    """All n = log2(N) rounds of the basic sumcheck prover, one dispatch.

    table: [N, L] Montgomery.  state/buf/pos: device sponge seeded with the
    initial-polynomial + claimed-sum absorbs (done host-side via native
    keccak, which beats streaming the table's bytes back to the host).

    Returns (univs_plain [n,2,L], univs_mont [n,2,L], digests [n,32],
    state', buf').
    """
    N = table.shape[0]
    n = N.bit_length() - 1
    sponge = DeviceSponge(state, buf, pos)

    univs_mont = []
    univs_plain = []
    digests = []
    univ_m = sum_halves(ctx, table)  # [2, L]
    univ_p = arith.from_mont(ctx, univ_m)
    for rnd in range(n):
        univs_mont.append(univ_m)
        univs_plain.append(univ_p)
        sponge = sponge.absorb(pack_bytes_be(ctx, univ_p))
        digest, sponge = sponge.squeeze()
        digests.append(digest)
        if rnd < n - 1:
            r = digest_to_mont(ctx, digest)
            table = fold(ctx, table, 0, r)
            univ_m = sum_halves(ctx, table)
            univ_p = arith.from_mont(ctx, univ_m)

    return (
        jnp.stack(univs_plain),
        jnp.stack(univs_mont),
        jnp.stack(digests),
        sponge.state,
        sponge.buf,
    )
