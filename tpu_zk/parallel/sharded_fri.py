"""Multi-device FRI: commit rounds over the mesh, fold + Merkle sharded.

SURVEY.md section 2 parallelism table, row "Merkle/FRI": leaf hashing
sharded, fold rounds like sumcheck, per-shard subtree roots gathered.  Each
commit round keeps the codeword block-sharded on the element axis:

  - the Merkle tree is ``sharded_merkle`` (contiguous blocks are aligned
    subtrees, top ``log2(D)`` levels from the D gathered roots);
  - the fold pairs ``(i, i + N/2)`` -- element i on shard ``k`` pairs with
    shard ``k + D/2``, one mirrored collective-permute that GSPMD inserts
    from the sharding annotations (the sumcheck-style exchange);
  - root absorb / beta squeeze run on the replicated device sponge.

Once the folded codeword drops below 2 rows per device the remaining rounds
run on the plain single-device path.  Proof bytes are bit-identical to
``fri.prove`` (``tests/test_parallel_ntt.py``): same Merkle digests, same
transcript, same query openings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields import arith
from ..fri.fri import FriConfig, FriProof, _query_phase, fold_codeword
from ..transcript.device_fs import DeviceSponge, absorb_dyn, digest_to_mont, squeeze_dyn
from ..transcript.fiat_shamir import Transcript
from .sharded_merkle import sharded_merkle_field_tree


def prove(config: FriConfig, codeword: jnp.ndarray, transcript: Transcript, mesh) -> FriProof:
    """Sharded-commit FRI prove; drop-in for ``fri.prove`` (same bytes)."""
    ctx = config.ctx
    D = int(mesh.devices.size)
    shard = NamedSharding(mesh, P("data", None))
    assert codeword.shape[0] == 1 << config.domain_log2

    sponge = DeviceSponge.from_host(transcript._hasher)
    state, buf = sponge.state, sponge.buf
    pos = jnp.int32(sponge.pos)

    current = jax.device_put(codeword, shard)
    codewords = [current]
    level_stack: list[jnp.ndarray] = []
    root_list = []
    for r in range(config.num_rounds):
        levels = sharded_merkle_field_tree(ctx, current, mesh)
        root = levels[-1][0]
        state, buf, pos = absorb_dyn(state, buf, pos, root)
        digest, state, buf, pos = squeeze_dyn(state, buf, pos)
        beta = digest_to_mont(ctx, digest)
        current = fold_codeword(ctx, current, beta, config._inv_x[r], config._inv2)
        if current.shape[0] >= 2 * D:
            current = jax.device_put(current, shard)
        level_stack.append(jnp.concatenate(levels[:-1]))
        root_list.append(root)
        codewords.append(current)

    roots_h, final_plain, state_h, buf_h, pos_h = jax.device_get(
        (jnp.stack(root_list), arith.from_mont(ctx, current), state, buf, pos)
    )
    roots = [bytes(np.asarray(rt).astype(np.uint8).tobytes()) for rt in roots_h]
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
