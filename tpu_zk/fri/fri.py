"""FRI low-degree test with Merkle commitments and Fiat-Shamir queries.

The reference declares a ``fri`` crate but left it empty (``fri/src/lib.rs``
is 0 lines); this fills the slot (BASELINE config 3: 2^18 codeword).

Protocol (commit-fold): the prover holds evaluations of f over the
multiplicative coset <w> of size N.  Each round: Merkle-commit the codeword,
absorb the root, squeeze beta, and fold

    f'(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x)

halving the domain, until ``final_size``; the last codeword is sent in clear.
Query phase: indices derived from the transcript; per round the prover opens
(i, i + N/2) with Merkle paths and the verifier recomputes the fold chain.

Folds are fused device kernels over the [N, L] limb table; Merkle layers use
the vectorized Keccak batch kernel; the transcript is the same host
Fiat-Shamir object the other protocols use.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import arith
from ..fields.arith import FieldCtx, field_ctx
from ..merkle.merkle import verify_path
from ..ntt.ntt import _twiddle_table, find_root_of_unity
from ..transcript.fiat_shamir import Transcript


@functools.partial(jax.jit, static_argnums=(0,))
def fold_codeword(
    ctx: FieldCtx,
    codeword: jnp.ndarray,
    beta: jnp.ndarray,
    inv_x: jnp.ndarray,
    inv2: jnp.ndarray,
) -> jnp.ndarray:
    """[N, L] -> [N/2, L]: one FRI fold at challenge beta.

    inv_x: [N/2, L] inverses of the first-half domain points; inv2: [L].
    """
    half = codeword.shape[0] // 2
    fx = codeword[:half]
    fnegx = codeword[half:]
    even = arith.mont_mul(ctx, arith.add(ctx, fx, fnegx), inv2)
    odd = arith.mont_mul(
        ctx, arith.mont_mul(ctx, arith.sub(ctx, fx, fnegx), inv2), inv_x
    )
    return arith.add(ctx, even, arith.mont_mul(ctx, odd, beta))


@functools.partial(jax.jit, static_argnums=(0,))
def _commit_round(ctx: FieldCtx, codeword, state, buf, pos, inv_x, inv2):
    """One FRI commit round entirely on device: Merkle tree over the
    codeword, absorb the root, squeeze beta, fold.  One compile per codeword
    size (reused across rounds/configs); chains asynchronously."""
    from ..merkle.device_merkle import field_leaf_bytes, merkle_levels_device
    from ..transcript.device_fs import absorb_dyn, digest_to_mont, squeeze_dyn

    levels = merkle_levels_device(field_leaf_bytes(ctx, codeword))
    root = levels[-1][0]  # [32] uint32 bytes
    state, buf, pos = absorb_dyn(state, buf, pos, root)
    digest, state, buf, pos = squeeze_dyn(state, buf, pos)
    beta = digest_to_mont(ctx, digest)
    folded = fold_codeword(ctx, codeword, beta, inv_x, inv2)
    # path levels flattened into one array so the query phase can open any
    # (level, index) sibling with a single gather per round
    flat = jnp.concatenate(levels[:-1])
    return flat, root, folded, state, buf, pos


@dataclass
class FriQueryRound:
    index: int
    value_lo: int  # f(x_i)
    value_hi: int  # f(-x_i)
    path_lo: list[bytes]
    path_hi: list[bytes]


@dataclass
class FriProof:
    roots: list[bytes]
    final_codeword: list[int]
    queries: list[list[FriQueryRound]]  # [query][round]


class FriConfig:
    def __init__(
        self,
        field_name: str,
        domain_log2: int,
        final_size_log2: int = 2,
        num_queries: int = 20,
        blowup_log2: int = 2,
    ):
        """Proves evaluations come from a polynomial of degree
        < 2^(domain_log2 - blowup_log2)."""
        assert blowup_log2 >= 1 and final_size_log2 >= blowup_log2
        self.field_name = field_name
        self.ctx = field_ctx(field_name)
        self.domain_log2 = domain_log2
        self.final_size_log2 = final_size_log2
        self.num_queries = num_queries
        self.blowup_log2 = blowup_log2
        self.root = find_root_of_unity(field_name, domain_log2)
        p = self.ctx.p
        self.num_rounds = domain_log2 - final_size_log2
        # per-round inverse domain points (first half), device Montgomery
        self._inv2 = self.ctx.scalar(pow(2, p - 2, p))
        self._inv_x = []
        w = self.root
        for r in range(self.num_rounds):
            size = 1 << (domain_log2 - r)
            w_inv = pow(w, p - 2, p)
            self._inv_x.append(_twiddle_table(self.ctx, self.ctx.scalar(w_inv), domain_log2 - r - 1))
            w = w * w % p


def _level_offset(size: int, lvl: int) -> int:
    """Start of digest level ``lvl`` in the flattened path-level array of a
    ``size``-leaf tree (level i holds ``size >> i`` digests)."""
    return 0 if lvl == 0 else 2 * size - (size >> (lvl - 1))


@functools.partial(jax.jit, static_argnums=(0,))
def _gather_openings(ctx: FieldCtx, codewords, stacks, vidx, sidx):
    """All rounds' opened values + Merkle siblings in ONE device program.

    The per-round host loop issued ~3 dispatches per round (gather,
    from_mont, sibling gather) -- ~40 tunnel round-trips at 2^18; this is
    one dispatch and one transfer for the whole query phase."""
    vals = jnp.concatenate(
        [arith.from_mont(ctx, cw[i]) for cw, i in zip(codewords, vidx)]
    )
    sibs = jnp.concatenate([st[i] for st, i in zip(stacks, sidx)])
    return vals, sibs


def _query_indices(transcript: Transcript, num: int, domain_size: int) -> list[int]:
    out = []
    while len(out) < num:
        digest = transcript.sample_random_challenge()
        for off in range(0, 32, 4):
            if len(out) >= num:
                break
            out.append(int.from_bytes(digest[off : off + 4], "little") % domain_size)
    return out


def prove(config: FriConfig, codeword: jnp.ndarray, transcript: Transcript) -> FriProof:
    """codeword: [N, L] Montgomery evaluations over the size-N domain.

    The commit phase runs entirely on device (``_commit_round``: Merkle tree,
    root absorb, beta squeeze, fold -- all chained asynchronously); only the
    roots, the final codeword, and the sponge state come back to the host.
    The query phase batches every opened value and Merkle sibling into one
    transfer.  r2's host-side loop moved ~2x the codeword per round through
    the tunnel and took 3.8 s at 2^18; this path moves a few KB total.
    """
    from ..transcript.device_fs import DeviceSponge

    ctx = config.ctx
    assert codeword.shape[0] == 1 << config.domain_log2

    # -- commit phase (device) -----------------------------------------------
    sponge = DeviceSponge.from_host(transcript._hasher)
    state, buf = sponge.state, sponge.buf
    pos = jnp.int32(sponge.pos)
    codewords = [codeword]
    level_stack: list[jnp.ndarray] = []  # flattened path levels per round
    root_list = []
    current = codeword
    for r in range(config.num_rounds):
        flat, root, current, state, buf, pos = _commit_round(
            ctx, current, state, buf, pos, config._inv_x[r], config._inv2
        )
        level_stack.append(flat)
        root_list.append(root)
        codewords.append(current)

    roots_h, final_plain, state_h, buf_h, pos_h = jax.device_get(
        (jnp.stack(root_list), arith.from_mont(ctx, current), state, buf, pos)
    )
    roots = [bytes(np.asarray(r).astype(np.uint8).tobytes()) for r in roots_h]
    transcript._hasher = DeviceSponge(None, None, int(pos_h)).to_host(
        np.asarray(state_h), np.asarray(buf_h)
    )

    final_codeword = [
        int.from_bytes(
            np.asarray(final_plain[i]).astype(np.uint16)[::-1].astype(">u2").tobytes(),
            "big",
        )
        for i in range(final_plain.shape[0])
    ]
    for v in final_codeword:
        transcript.append(ctx.to_bytes_be(v))

    return _query_phase(
        config, codewords, level_stack, roots, final_codeword, transcript
    )


def _query_phase(
    config: FriConfig,
    codewords: list[jnp.ndarray],
    level_stack: list[jnp.ndarray],
    roots: list[bytes],
    final_codeword: list[int],
    transcript: Transcript,
) -> FriProof:
    """Open the Fiat-Shamir query positions: batch every value and Merkle
    sibling gather across all rounds into one transfer."""
    ctx = config.ctx
    # -- query phase: batch all gathers, ONE transfer ------------------------
    indices = _query_indices(transcript, config.num_queries, 1 << (config.domain_log2 - 1))
    tracked = list(indices)
    round_positions: list[list[int]] = []
    for r in range(config.num_rounds):
        half = 1 << (config.domain_log2 - r - 1)
        tracked = [i % half for i in tracked]
        round_positions.append(tracked)

    vidx = []
    sidx = []  # one [n_open * n_levels] sibling index array per round
    nlevels_per_round = []
    for r, positions in enumerate(round_positions):
        size = 1 << (config.domain_log2 - r)
        half = size // 2
        opened = np.asarray(
            [p for i in positions for p in (i, i + half)], dtype=np.int64
        )
        vidx.append(jnp.asarray(opened, dtype=jnp.int32))
        nlevels = size.bit_length() - 1  # path levels (excludes the root)
        nlevels_per_round.append(nlevels)
        # offset of level l inside the flattened array: size + size/2 + ...
        flat_idx = np.concatenate(
            [_level_offset(size, lvl) + ((opened >> lvl) ^ 1) for lvl in range(nlevels)]
        )
        sidx.append(jnp.asarray(flat_idx, jnp.int32))

    values_all, sibs_all = _gather_openings(
        ctx,
        tuple(codewords[: config.num_rounds]),
        tuple(level_stack),
        tuple(vidx),
        tuple(sidx),
    )
    values_h, sibs_h = (
        np.asarray(a) for a in jax.device_get((values_all, sibs_all))
    )

    n_open = 2 * len(indices)
    round_values = []
    for r in range(config.num_rounds):
        chunk = values_h[r * n_open : (r + 1) * n_open]
        round_values.append(
            [
                int.from_bytes(
                    chunk[i].astype(np.uint16)[::-1].astype(">u2").tobytes(), "big"
                )
                for i in range(n_open)
            ]
        )
    # regroup sibling digests: paths[round][opened slot] -> list of 32B bytes
    paths: list[list[list[bytes]]] = []
    base = 0
    for r in range(config.num_rounds):
        nlevels = nlevels_per_round[r]
        block = sibs_h[base : base + n_open * nlevels].astype(np.uint8)
        base += n_open * nlevels
        slot_paths = [
            [bytes(block[lvl * n_open + slot].tobytes()) for lvl in range(nlevels)]
            for slot in range(n_open)
        ]
        paths.append(slot_paths)

    queries = []
    for q in range(len(indices)):
        rounds = []
        for r in range(config.num_rounds):
            index = round_positions[r][q]
            rounds.append(
                FriQueryRound(
                    index=index,
                    value_lo=round_values[r][2 * q],
                    value_hi=round_values[r][2 * q + 1],
                    path_lo=paths[r][2 * q],
                    path_hi=paths[r][2 * q + 1],
                )
            )
        queries.append(rounds)

    return FriProof(roots=roots, final_codeword=final_codeword, queries=queries)


def verify(config: FriConfig, proof: FriProof, transcript: Transcript) -> bool:
    ctx = config.ctx
    p = ctx.p
    if len(proof.roots) != config.num_rounds:
        return False

    betas = []
    for root in proof.roots:
        transcript.append(root)
        betas.append(transcript.random_challenge_as_field_element(ctx))
    for v in proof.final_codeword:
        transcript.append(ctx.to_bytes_be(v))

    # final codeword must itself be low-degree: interpolate over its (small)
    # domain and check every coefficient at/above the folded degree bound is 0
    m = len(proof.final_codeword)
    if m != 1 << config.final_size_log2:
        return False
    w_final = pow(config.root, 1 << config.num_rounds, p)
    m_inv = pow(m, p - 2, p)
    w_final_inv = pow(w_final, p - 2, p)
    coeffs = [
        m_inv * sum(
            v * pow(w_final_inv, i * j, p) for i, v in enumerate(proof.final_codeword)
        ) % p
        for j in range(m)
    ]
    degree_bound = 1 << (config.final_size_log2 - config.blowup_log2)
    if any(c != 0 for c in coeffs[degree_bound:]):
        return False

    indices = _query_indices(transcript, config.num_queries, 1 << (config.domain_log2 - 1))
    if len(proof.queries) != len(indices):
        return False

    w0 = config.root
    inv2 = pow(2, p - 2, p)
    for idx, rounds in zip(indices, proof.queries):
        if len(rounds) != config.num_rounds:
            return False
        pos = idx  # position of the value being tracked in the current codeword
        expected_next = None
        w = w0
        for r, q in enumerate(rounds):
            size = 1 << (config.domain_log2 - r)
            half = size // 2
            index = pos % half
            if q.index != index:
                return False
            leaf_lo = ctx.to_bytes_be(q.value_lo)
            leaf_hi = ctx.to_bytes_be(q.value_hi)
            if not verify_path(proof.roots[r], leaf_lo, index, q.path_lo):
                return False
            if not verify_path(proof.roots[r], leaf_hi, index + half, q.path_hi):
                return False
            if expected_next is not None:
                actual = q.value_lo if pos < half else q.value_hi
                if actual != expected_next:
                    return False
            x = pow(w, index, p)
            x_inv = pow(x, p - 2, p)
            even = (q.value_lo + q.value_hi) * inv2 % p
            odd = (q.value_lo - q.value_hi) * inv2 % p * x_inv % p
            expected_next = (even + betas[r] * odd) % p
            w = w * w % p
            pos = index  # position in the folded (next) codeword
        if proof.final_codeword[pos] != expected_next:
            return False
    return True
