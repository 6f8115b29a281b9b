"""North-star run (BASELINE config 5): end-to-end succinct GKR -- the
linear-time (Libra) fused prover + multilinear-KZG-committed inputs -- over a
2^depth-input reduction tree, on the real TPU chip.

Semantics match ``/root/reference/gkr/src/succinct_gkr_protocol.rs:35-169``
(prove) and ``:172-284`` (verify) at a scale the dense reference pipeline
cannot reach (its 2^(3i+2) wiring tables overflow past ~2^8-wide layers).

Usage: python benchmarks/north_star.py [depth] [--no-verify]
Writes benchmarks/north_star.json and prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_zk.utils.cache import enable_persistent_cache

enable_persistent_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(depth: int, do_verify: bool = True):
    import jax
    import jax.numpy as jnp

    from tpu_zk.circuit.layered import ADD, tree_sum_circuit
    from tpu_zk.fields import arith
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.gkr import fused_sparse, sparse
    from tpu_zk.kzg.trusted_setup import TrustedSetup, generate_values_for_tau

    log(f"devices: {jax.devices()}  depth={depth}")
    ctx = field_ctx("bls12_381_fr")
    circuit = tree_sum_circuit(ctx, depth, op=ADD)
    n = 1 << depth
    gates = n - 1

    plain = np.zeros((n, ctx.L), np.uint32)
    plain[:, 0] = (np.arange(n) * 31 + 7) % 65521
    r2 = jnp.asarray(arith._limbs_of_int(ctx.R2, ctx.L))
    inputs = arith.mont_mul(ctx, jnp.asarray(plain), r2)

    t0 = time.perf_counter()
    taus = generate_values_for_tau("bls12_381", depth)
    setup = TrustedSetup.initialize_setup("bls12_381", taus)
    setup.folded_g1_bases()
    jax.block_until_ready(setup.g1_powers_of_tau)
    t_setup = time.perf_counter() - t0
    log(f"trusted setup 2^{depth}: {t_setup:.2f} s")

    t0 = time.perf_counter()
    proof = fused_sparse.prove_succinct(circuit, inputs, setup)
    t_prove_cold = time.perf_counter() - t0
    log(f"prove (cold, incl. compiles): {t_prove_cold:.2f} s")

    t0 = time.perf_counter()
    proof = fused_sparse.prove_succinct(circuit, inputs, setup)
    t_prove = time.perf_counter() - t0
    log(f"prove (warm): {t_prove:.2f} s ({gates / t_prove:.0f} gates/s)")

    t_verify = None
    if do_verify:
        t0 = time.perf_counter()
        ok = sparse.verify_succinct(circuit, proof, setup)
        t_verify = time.perf_counter() - t0
        log(f"verify: {t_verify:.2f} s -> {ok}")
        assert ok, "proof did not verify"

    result = {
        "depth": depth,
        "gates": gates,
        "setup_s": round(t_setup, 3),
        "prove_cold_s": round(t_prove_cold, 3),
        "prove_s": round(t_prove, 3),
        "gates_per_s": round(gates / t_prove, 1),
        "verify_s": round(t_verify, 3) if t_verify is not None else None,
        "platform": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(__file__), "north_star.json")
    existing = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
        except Exception:
            existing = {}
    existing[str(depth)] = result
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 20, do_verify="--no-verify" not in sys.argv)
