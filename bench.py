"""Benchmark harness: runs on the real TPU chip (axon default platform).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Full breakdown goes to stderr and benchmarks/results.json.

Primary metric (per BASELINE.json): sumcheck prover round throughput.  The
reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against our recorded previous-round result when available, else 1.0.
"""

import json
import os
import sys
import time

import jax

from tpu_zk.utils.cache import enable_persistent_cache

enable_persistent_cache()

RESULTS_PATH = os.path.join(os.path.dirname(__file__), "benchmarks", "results.json")
# previous round's recorded numbers (committed, never overwritten by runs):
# vs_baseline compares against this so repeat runs within a round don't
# shift the baseline under themselves
BASELINE_PATH = os.path.join(
    os.path.dirname(__file__), "benchmarks", "baseline_prev_round.json"
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def force(out):
    """Force execution + materialization with a tiny transfer.

    ``block_until_ready`` is not reliable through the remote-TPU tunnel, so
    reduce each output on-device and pull the scalar."""
    import jax.numpy as jnp
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jnp.sum(leaf, dtype=jnp.uint32))


def timeit(fn, warmup=1, iters=3):
    for _ in range(warmup):
        force(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn())
    return (time.perf_counter() - t0) / iters


def best_of(fn, reps=3):
    """Min over reps timed runs: the tunnel's per-dispatch latency swings
    2-4x between sessions, and host-loop sections (many dispatches) inherit
    that noise; the minimum tracks the kernel's actual cost."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_sumcheck_round(n_log2=20, iters=10):
    """One fused sumcheck prover round (fold + half-sums) at 2^n.

    Measures the limb-major MXU round the fused prover actually runs
    (``poly.multilinear.fold_and_half_sums_lm``): iterations are chained
    (output feeds input) and synced once, so the ~85 ms tunnel round-trip
    amortizes away instead of dominating every sample."""
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.poly.multilinear import fold_and_half_sums_lm

    ctx = field_ctx("bn254_fr")
    n = 1 << n_log2

    @jax.jit
    def two_rounds(lm):
        f1, u1 = fold_and_half_sums_lm(ctx, lm, r)
        f2, _ = fold_and_half_sums_lm(ctx, lm, u1[0])
        return jnp.concatenate([f1, f2], axis=1)  # keeps the working set fixed

    import numpy as np
    import jax.numpy as jnp

    base = np.arange(n, dtype=np.uint32) % 65521
    limbs = np.zeros((n, ctx.L), np.uint32)
    limbs[:, 0] = base  # small canonical values (valid Montgomery residues)
    table = jnp.asarray(limbs).T  # limb-major [L, N]
    r = ctx.scalar(123456789)

    force(two_rounds(table))  # warmup/compile
    t0 = time.perf_counter()
    y = table
    for _ in range(iters):
        y = two_rounds(y)
    force(y)
    dt = (time.perf_counter() - t0) / (2 * iters)
    log(f"sumcheck round 2^{n_log2}: {dt*1e3:.1f} ms ({n/dt/1e6:.1f} M elem/s)")
    return {"sumcheck_round_s": dt, "sumcheck_elems_per_s": n / dt, "n_log2": n_log2}


def bench_full_sumcheck(n_log2=18):
    """Full prove (device rounds + host Fiat-Shamir) at 2^n."""
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.poly.multilinear import MultilinearPolynomial
    from tpu_zk.sumcheck import basic

    ctx = field_ctx("bn254_fr")
    n = 1 << n_log2
    import numpy as np
    import jax.numpy as jnp

    limbs = np.zeros((n, ctx.L), np.uint32)
    limbs[:, 0] = np.arange(n, dtype=np.uint32) % 65521
    poly = MultilinearPolynomial(ctx, jnp.asarray(limbs))

    def run():
        return basic.Prover(poly).prove()

    run()  # warmup/compile
    dt = best_of(run)
    log(f"full sumcheck prove 2^{n_log2}: {dt:.2f} s ({n_log2/dt:.2f} rounds/s)")
    return {"full_prove_s": dt, "rounds_per_s": n_log2 / dt, "n_log2": n_log2}


def bench_msm(n_log2=16, curve="bls12_381"):
    from tpu_zk.curves.ec_device import DeviceCurve
    from tpu_zk.curves.msm_pippenger import msm_pippenger

    dc = DeviceCurve(curve)
    hc = dc.host
    g = hc.g1_affine(hc.g1_generator())
    n = 1 << n_log2
    P = dc.points_to_device([g] * n)
    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(n, dc.fr.L), dtype=np.uint32)
    limbs[:, -1] &= 0x3FF  # keep < p
    limbs = jnp.asarray(limbs)

    dt = timeit(lambda: msm_pippenger(dc.ctx, dc.b3, (P, limbs)), warmup=1, iters=1)
    log(f"msm 2^{n_log2} ({curve}): {dt:.2f} s ({n/dt:.0f} points/s)")
    return {"msm_s": dt, "msm_points_per_s": n / dt, "n_log2": n_log2, "curve": curve}


def bench_ntt(n_log2=20):
    """Forward NTT via the multi-pass Bailey plan (ntt/sixstep.py)."""
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.ntt.ntt import NTT

    ctx = field_ctx("bn254_fr")
    ntt = NTT("bn254_fr", n_log2)
    n = 1 << n_log2
    import numpy as np
    import jax.numpy as jnp

    limbs = np.zeros((n, ctx.L), np.uint32)
    limbs[:, 0] = np.arange(n, dtype=np.uint32) % 65521
    table = jnp.asarray(limbs)

    force(ntt.forward(table))  # warmup/compile
    dt_f = best_of(lambda: force(ntt.forward(table)))
    log(f"ntt fwd 2^{n_log2}: {dt_f*1e3:.1f} ms ({n/dt_f/1e6:.1f} M elem/s)")
    return {"ntt_forward_s": dt_f, "ntt_elems_per_s": n / dt_f, "n_log2": n_log2}


def bench_fri(n_log2=18):
    """FRI commit+prove over a 2^18 codeword (BASELINE config 3)."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.fri.fri import FriConfig, prove
    from tpu_zk.ntt.ntt import NTT
    from tpu_zk.transcript.fiat_shamir import Transcript

    ctx = field_ctx("bn254_fr")
    n = 1 << n_log2
    cfg = FriConfig("bn254_fr", n_log2, final_size_log2=4, num_queries=20, blowup_log2=2)
    # low-degree codeword: NTT of sparse coefficients
    coeffs = np.zeros((n, ctx.L), np.uint32)
    coeffs[: n >> cfg.blowup_log2, 0] = (
        np.arange(n >> cfg.blowup_log2, dtype=np.uint32) % 65521
    )
    codeword = NTT("bn254_fr", n_log2, cfg.root).forward(jnp.asarray(coeffs))

    def run():
        return prove(cfg, codeword, Transcript())

    run()  # warmup/compile
    dt = best_of(run)
    log(f"fri prove 2^{n_log2}: {dt:.2f} s ({n/dt/1e6:.2f} M elems/s)")
    return {"fri_prove_s": dt, "fri_elems_per_s": n / dt, "n_log2": n_log2}


def bench_msm_large(n_log2=20, curve="bls12_381"):
    """Config-4 scale MSM (2^20 points, the KZG-commit shape)."""
    return bench_msm(n_log2=n_log2, curve=curve)


def bench_kzg(n_log2=16):
    """Multilinear KZG commit + open + verify at 2^n evaluations
    (reference multilinear_kzg.rs:25-158).  Config-4 scale (2^20) is
    timed in the north-star run (benchmarks/north_star.json: the depth-20
    entry's prove includes the 2^20 commit and both opens); this section
    keeps a repeatable same-shapes measurement inside the bench budget."""
    import numpy as np

    from tpu_zk.fields import arith
    from tpu_zk.kzg import multilinear_kzg
    from tpu_zk.kzg.trusted_setup import TrustedSetup
    from tpu_zk.poly.multilinear import MultilinearPolynomial

    taus = [(i * 7919 + 13) % 1000003 for i in range(n_log2)]
    t0 = time.perf_counter()
    setup = TrustedSetup.initialize_setup("bls12_381", taus)
    setup.folded_g1_bases()
    force(setup.g1_powers_of_tau)
    t_setup = time.perf_counter() - t0

    fr = setup.curve.fr
    n = 1 << n_log2
    limbs = np.zeros((n, fr.L), np.uint32)
    limbs[:, 0] = (np.arange(n) * 31 + 7) % 65521
    import jax.numpy as jnp

    r2 = jnp.asarray(arith._limbs_of_int(fr.R2, fr.L))
    poly = MultilinearPolynomial(fr, arith.mont_mul(fr, jnp.asarray(limbs), r2))
    opening = [(i * 104729 + 3) % fr.p for i in range(n_log2)]

    t0 = time.perf_counter()
    commitment = multilinear_kzg.commit_to_polynomial(poly, setup)
    t_commit = time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = multilinear_kzg.open_and_prove(poly, setup, opening)
    t_open = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = multilinear_kzg.verify(setup, commitment, opening, proof)
    t_verify = time.perf_counter() - t0
    assert ok, "kzg verify failed"
    log(
        f"kzg 2^{n_log2}: setup {t_setup:.2f} s, commit {t_commit:.2f} s, "
        f"open {t_open:.2f} s, verify {t_verify:.2f} s"
    )
    return {
        "kzg_setup_s": t_setup,
        "kzg_commit_s": t_commit,
        "kzg_open_s": t_open,
        "kzg_verify_s": t_verify,
        "kzg_open_evals_per_s": n / t_open,
        "n_log2": n_log2,
    }


def bench_sparse_gkr(depth=13):
    """Fused linear-time GKR over a 2^depth-input reduction tree (config-5
    shape): pooled per-size round programs, async device chaining."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_zk.circuit.layered import ADD, tree_sum_circuit
    from tpu_zk.fields import arith
    from tpu_zk.fields.arith import field_ctx
    from tpu_zk.gkr import fused_sparse

    ctx = field_ctx("bn254_fr")
    circuit = tree_sum_circuit(ctx, depth, op=ADD)
    n = 1 << depth
    plain = np.zeros((n, ctx.L), np.uint32)
    plain[:, 0] = (np.arange(n) * 31 + 7) % 65521
    r2 = jnp.asarray(arith._limbs_of_int(ctx.R2, ctx.L))
    table = arith.mont_mul(ctx, jnp.asarray(plain), r2)

    fused_sparse.prove(circuit, table)  # warmup/compile
    dt = best_of(lambda: fused_sparse.prove(circuit, table))
    gates = n - 1
    log(f"sparse gkr prove 2^{depth}-input tree: {dt:.2f} s ({gates/dt:.0f} gates/s)")
    return {"gkr_prove_s": dt, "gkr_gates_per_s": gates / dt, "depth": depth}


# (section, throughput key) pairs folded into the headline geomean
SUITE_KEYS = [
    ("sumcheck_round", "sumcheck_elems_per_s"),
    ("sumcheck_round_24", "sumcheck_elems_per_s"),
    ("full_sumcheck", "rounds_per_s"),
    ("ntt", "ntt_elems_per_s"),
    ("msm", "msm_points_per_s"),
    ("msm_20", "msm_points_per_s"),
    ("kzg", "kzg_open_evals_per_s"),
    ("fri", "fri_elems_per_s"),
    ("gkr", "gkr_gates_per_s"),
]


def write_speed_of_light(results: dict) -> None:
    """Emit benchmarks/speed_of_light.md: each kernel vs its roofline."""
    from tpu_zk.utils import roofline as rl

    rows = []
    specs = [
        ("sumcheck_round", "sumcheck_round_s", lambda r: rl.sumcheck_round_model(r["n_log2"])),
        ("sumcheck_round_24", "sumcheck_round_s", lambda r: rl.sumcheck_round_model(r["n_log2"])),
        ("ntt", "ntt_forward_s", lambda r: rl.ntt_model(r["n_log2"])),
        ("msm", "msm_s", lambda r: rl.msm_model(r["n_log2"], 30 if r.get("curve") == "bls12_381" else 20)),
        ("msm_20", "msm_s", lambda r: rl.msm_model(r["n_log2"], 30 if r.get("curve") == "bls12_381" else 20)),
        ("fri", "fri_prove_s", lambda r: rl.fri_model(r["n_log2"], r["n_log2"] - 4)),
        ("gkr", "gkr_prove_s", lambda r: rl.gkr_layer_model(r["depth"])),
    ]
    for section, time_key, model_fn in specs:
        r = results.get(section)
        if not r or time_key not in r:
            continue
        row = model_fn(r).row(r[time_key])
        rows.append(row)
        log(f"SoL {row['kernel']}: {row['pct_of_sol']:.1f}% of roofline ({row['bound']}-bound)")
    if rows:
        path = os.path.join(os.path.dirname(__file__), "benchmarks", "speed_of_light.md")
        with open(path, "w") as f:
            f.write(rl.render_markdown(rows))


def main():
    t_start = time.perf_counter()
    # the tunnel's per-process attach costs minutes by itself; the budget
    # below bounds *section* time so the driver's overall timeout is never
    # hit mid-suite (rc=124 wiped the r2 record) -- sections that don't fit
    # are skipped and their previous-round numbers carried forward.
    budget = float(os.environ.get("BENCH_BUDGET_S", "480"))
    log(f"devices: {jax.devices()}")
    from tpu_zk.utils.roofline import METHODOLOGY

    results = {"platform": str(jax.devices()[0]), "methodology": METHODOLOGY}

    prev_results = None
    if os.path.exists(RESULTS_PATH):
        try:
            with open(RESULTS_PATH) as f:
                prev_results = json.load(f)
        except Exception:
            prev_results = None

    # ordered by information value: a fresh process pays ~100 s of cached-
    # program loading for each dispatch-heavy section, so under a tight
    # budget the later sections carry their previous in-round numbers
    sections = [
        ("sumcheck_round", bench_sumcheck_round),
        ("sumcheck_round_24", lambda: bench_sumcheck_round(n_log2=24, iters=2)),
        ("ntt", bench_ntt),
        ("gkr", bench_sparse_gkr),  # depth 13: 8191-gate tree (sizes warm in cache)
        ("msm", bench_msm),
        ("fri", bench_fri),
        ("full_sumcheck", bench_full_sumcheck),
        ("kzg", bench_kzg),
        ("msm_20", bench_msm_large),
    ]
    for name, fn in sections:
        elapsed = time.perf_counter() - t_start
        if elapsed > budget:
            carried = (prev_results or {}).get(name)
            log(f"SKIP {name}: {elapsed:.0f}s elapsed > {budget:.0f}s budget"
                + (" (carrying previous result)" if carried else ""))
            if carried:
                results[name] = dict(carried, stale=True)
            continue
        try:
            t_sec = time.perf_counter()
            results[name] = fn()
            log(f"[section {name}: {time.perf_counter() - t_sec:.0f}s]")
        except Exception as e:  # a broken section must not kill the record
            log(f"FAIL {name}: {type(e).__name__}: {e}")
            carried = (prev_results or {}).get(name)
            if carried:
                results[name] = dict(carried, stale=True)

    prev = None
    for path in (BASELINE_PATH, RESULTS_PATH):
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
                break
            except Exception:
                prev = None

    # headline: per-chip sumcheck round throughput (the BASELINE.json primary
    # metric); vs_baseline = geomean speedup of the whole kernel suite over
    # the previous recorded round, so every kernel's progress counts.
    primary = results.get("sumcheck_round", {}).get("sumcheck_elems_per_s", 0.0)
    import math

    ratios = []
    for section, key in SUITE_KEYS:
        new = results.get(section, {}).get(key)
        old = (prev or {}).get(section, {}).get(key)
        if new and old:
            ratios.append(new / old)
    vs = math.exp(sum(map(math.log, ratios)) / len(ratios)) if ratios else 1.0
    log(f"suite geomean vs previous round: {vs:.3f} ({len(ratios)} kernels)")

    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)

    try:
        write_speed_of_light(results)
    except Exception as e:
        log(f"speed-of-light table failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "sumcheck_round_throughput_2^20",
                "value": round(primary / 1e6, 3),
                "unit": "M elements/s per chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
