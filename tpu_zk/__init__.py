"""tpu-zk: a TPU-native zero-knowledge-proof primitive framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust
workspace ``casweeney/zk-cryptography-research-implementations`` (multilinear
polynomials, sumcheck, GKR, multilinear KZG, NTT, Merkle/FRI, Shamir), but
designed TPU-first: field elements are packed 16-bit limb vectors, evaluation
tables shard across device meshes, and protocol state machines run on the
host so proofs stay bit-identical to the reference's test vectors.
"""

from .fields.arith import field_ctx

__all__ = ["field_ctx"]
__version__ = "0.1.0"
