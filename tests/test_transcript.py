"""Keccak-256 known-answer tests + transcript semantics."""

import numpy as np

from tpu_zk.fields.arith import field_ctx
from tpu_zk.transcript.fiat_shamir import Transcript
from tpu_zk.transcript.keccak import Keccak256, keccak256, keccak256_batch


def test_keccak_empty():
    # canonical Keccak-256("") (pre-NIST padding), e.g. ethereum's empty hash
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak_known_vectors():
    # Keccak-256("abc") and a >rate-length message
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # 136-byte message forces a full pad block
    msg = b"\x00" * 136
    h1 = keccak256(msg)
    # incremental split absorb must match one-shot
    k = Keccak256()
    k.update(msg[:77])
    k.update(msg[77:])
    assert k.digest() == h1


def test_keccak_incremental_equals_oneshot():
    msg = bytes(range(256)) * 3
    k = Keccak256()
    for i in range(0, len(msg), 19):
        k.update(msg[i : i + 19])
    assert k.digest() == keccak256(msg)


def test_keccak_batch_matches_scalar():
    msgs = np.frombuffer(bytes(range(64)) * 4, dtype=np.uint8).reshape(4, 64)
    out = keccak256_batch(msgs)
    for i in range(4):
        assert out[i].tobytes() == keccak256(msgs[i].tobytes())


def test_transcript_clone_finalize_semantics():
    # sample = digest of current state; state then absorbs the digest
    t1 = Transcript()
    t1.append(b"boy")
    c1 = t1.sample_random_challenge()
    assert c1 == keccak256(b"boy")
    c2 = t1.sample_random_challenge()
    assert c2 == keccak256(b"boy" + c1)
    assert c1 != c2


def test_transcript_challenge_le_reduction():
    ctx = field_ctx("bn254_fq")
    t = Transcript()
    t.append(b"boy")
    expected = int.from_bytes(keccak256(b"boy"), "little") % ctx.p
    t2 = Transcript()
    t2.append(b"boy")
    assert t2.random_challenge_as_field_element(ctx) == expected


def test_transcript_order_sensitivity():
    a = Transcript(); a.append(b"x"); a.append(b"y")
    b = Transcript(); b.append(b"y"); b.append(b"x")
    assert a.sample_random_challenge() != b.sample_random_challenge()
    # but split boundaries don't matter
    c = Transcript(); c.append(b"xy")
    d = Transcript(); d.append(b"x"); d.append(b"y")
    assert c.sample_random_challenge() == d.sample_random_challenge()


def test_dynamic_sponge_matches_static():
    """absorb_dyn/squeeze_dyn (traced buffer position) must emit the same
    digests as the static-pos DeviceSponge and the host Transcript across
    absorb sizes that do and don't cross the 136-byte rate boundary."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_zk.transcript.device_fs import DeviceSponge, absorb_dyn, squeeze_dyn
    from tpu_zk.transcript.fiat_shamir import Transcript

    host = Transcript()
    sponge = DeviceSponge.fresh()
    state, buf = sponge.state, sponge.buf
    pos = jnp.int32(0)

    rng = np.random.default_rng(7)
    for k in (32, 96, 96, 17, 135, 96, 96, 96, 1, 136):
        data = rng.integers(0, 256, size=k).astype(np.uint32)
        host.append(bytes(data.astype(np.uint8).tobytes()))
        state, buf, pos = absorb_dyn(state, buf, pos, jnp.asarray(data))
        digest_host = host.sample_random_challenge()
        digest, state, buf, pos = squeeze_dyn(state, buf, pos)
        got = bytes(np.asarray(digest).astype(np.uint8).tobytes())
        assert got == digest_host, f"mismatch after absorb of {k} bytes"
