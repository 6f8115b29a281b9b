"""Merkle tree + FRI low-degree test."""

import numpy as np
import pytest

from tpu_zk.fields.arith import field_ctx
from tpu_zk.fri import fri
from tpu_zk.merkle.merkle import MerkleTree, verify_path
from tpu_zk.ntt.ntt import NTT
from tpu_zk.transcript.fiat_shamir import Transcript

FR = field_ctx("bn254_fr")


def test_merkle_roundtrip():
    leaves = np.arange(8 * 32, dtype=np.uint8).reshape(8, 32)
    tree = MerkleTree(leaves)
    assert tree.num_leaves == 8
    for i in range(8):
        path = tree.open(i)
        assert len(path) == 3
        assert verify_path(tree.root, leaves[i].tobytes(), i, path)
    # wrong leaf fails
    assert not verify_path(tree.root, b"\x00" * 32, 0, tree.open(1))
    assert not verify_path(tree.root, leaves[0].tobytes(), 1, tree.open(0))


def test_merkle_deterministic():
    leaves = np.zeros((4, 32), np.uint8)
    assert MerkleTree(leaves).root == MerkleTree(leaves).root


def _codeword(config, coeffs):
    """Evaluate the coefficient list over the FRI domain (same root)."""
    ntt = NTT(config.field_name, config.domain_log2, root=config.root)
    padded = list(coeffs) + [0] * (ntt.N - len(coeffs))
    return ntt.forward(config.ctx.array(padded))


def test_fri_honest_roundtrip():
    config = fri.FriConfig("bn254_fr", domain_log2=8, final_size_log2=2, num_queries=10)
    # degree < 2^(8-2) = 64
    coeffs = [(i * 37 + 5) % 1009 for i in range(64)]
    codeword = _codeword(config, coeffs)
    proof = fri.prove(config, codeword, Transcript())
    assert fri.verify(config, proof, Transcript())


def test_fri_rejects_high_degree():
    config = fri.FriConfig("bn254_fr", domain_log2=8, final_size_log2=2, num_queries=20)
    # degree far above the bound: a random-looking codeword
    vals = [(i * 7919 + 31) % FR.p for i in range(1 << 8)]
    codeword = config.ctx.array(vals)
    proof = fri.prove(config, codeword, Transcript())
    assert not fri.verify(config, proof, Transcript())


def test_fri_rejects_tampered_final():
    config = fri.FriConfig("bn254_fr", domain_log2=8, final_size_log2=2, num_queries=10)
    coeffs = [(i * 37 + 5) % 1009 for i in range(64)]
    proof = fri.prove(config, _codeword(config, coeffs), Transcript())
    proof.final_codeword[0] = (proof.final_codeword[0] + 1) % FR.p
    assert not fri.verify(config, proof, Transcript())


def test_fri_rejects_tampered_query_value():
    config = fri.FriConfig("bn254_fr", domain_log2=8, final_size_log2=2, num_queries=10)
    coeffs = [(i * 37 + 5) % 1009 for i in range(64)]
    proof = fri.prove(config, _codeword(config, coeffs), Transcript())
    proof.queries[0][0].value_lo = (proof.queries[0][0].value_lo + 1) % FR.p
    assert not fri.verify(config, proof, Transcript())


def test_device_merkle_matches_host():
    """Device-batched Keccak Merkle levels must be byte-identical to the host
    tree (same leaf encoding, same pairing)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.merkle.device_merkle import field_leaf_bytes, merkle_field_tree
    from tpu_zk.merkle.merkle import MerkleTree

    ctx = field_ctx("bn254_fr")
    table = ctx.array([(i * 73 + 5) % ctx.p for i in range(64)])
    levels = merkle_field_tree(ctx, table)
    leaf_np = np.asarray(field_leaf_bytes(ctx, table)).astype(np.uint8)
    host = MerkleTree(leaf_np)
    assert len(levels) == len(host.levels)
    for dev, hst in zip(levels, host.levels):
        assert np.array_equal(np.asarray(dev).astype(np.uint8), hst)
