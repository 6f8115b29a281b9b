"""Speed-of-light (roofline) model for the hot kernels on TPU v5e.

The reference ships only field-op *counting* (field-tracker; SURVEY.md
section 5 "Tracing / profiling"); production kernels need the next step: how
far is each kernel from what the chip can physically do.  For every benched
kernel this module computes

  - bytes moved through HBM (reads + writes of the limb tables),
  - useful u32 limb multiplies and adds (the VPU work an ideal schedule
    would retire -- Montgomery CIOS is 2*L^2 multiplies per field mul),
  - the memory-bound and compute-bound time floors, whose max is the
    roofline, and the kernel's achieved fraction of it.

Hardware constants: HBM bandwidth is the MEASURED ceiling of this chip
(~165 GB/s via a pure-copy Pallas kernel sweep through the axon tunnel --
the v5e public spec says 819 GB/s, but that is not what this virtualized
single chip delivers, and a roofline built on an unreachable number is not
a speed-of-light argument).  VPU: lanes 8x128, ~4 simple int ALU ops or ~1
32-bit multiply per lane-cycle at ~1.5 GHz -> ~6.1e12 add/s, ~1.5e12 mul/s.
MXU: ~98e12 bf16 MACs/s (197 TFLOPS spec) -- the digit-matmul kernels
(fields/mxu_mul.py) retire limb products there instead of the VPU.
"""

from __future__ import annotations

from dataclasses import dataclass

HBM_BYTES_PER_S = 165e9  # measured pure-copy ceiling, this chip
VPU_U32_MUL_PER_S = 1.5e12
VPU_U32_ADD_PER_S = 6.1e12
MXU_BF16_MACS_PER_S = 98e12

# Bumped whenever the roofline constants or the bench timing methodology
# change (r4: measured-tunnel HBM ceiling replaced the 819 GB/s spec;
# best-of-N min timing replaced single-run).  Written into
# benchmarks/results.json so cross-round comparisons can detect a
# methodology change mechanically instead of comparing apples to oranges.
METHODOLOGY = {
    "version": 2,
    "hbm_bytes_per_s": HBM_BYTES_PER_S,
    "vpu_u32_mul_per_s": VPU_U32_MUL_PER_S,
    "vpu_u32_add_per_s": VPU_U32_ADD_PER_S,
    "mxu_bf16_macs_per_s": MXU_BF16_MACS_PER_S,
    "timing": "best-of-N min (N=3) per section; chained iterations for round kernels",
}


@dataclass
class KernelModel:
    name: str
    bytes_moved: float
    u32_muls: float
    u32_adds: float
    mxu_macs: float = 0.0

    @property
    def t_memory(self) -> float:
        return self.bytes_moved / HBM_BYTES_PER_S

    @property
    def t_compute(self) -> float:
        return (
            self.u32_muls / VPU_U32_MUL_PER_S
            + self.u32_adds / VPU_U32_ADD_PER_S
            + self.mxu_macs / MXU_BF16_MACS_PER_S
        )

    @property
    def t_roofline(self) -> float:
        return max(self.t_memory, self.t_compute)

    def row(self, measured_s: float) -> dict:
        return {
            "kernel": self.name,
            "bytes_moved": self.bytes_moved,
            "u32_muls": self.u32_muls,
            "u32_adds": self.u32_adds,
            "t_memory_ms": self.t_memory * 1e3,
            "t_compute_ms": self.t_compute * 1e3,
            "t_roofline_ms": self.t_roofline * 1e3,
            "t_measured_ms": measured_s * 1e3,
            "pct_of_sol": 100.0 * self.t_roofline / measured_s if measured_s else 0.0,
            "bound": "memory" if self.t_memory >= self.t_compute else "compute",
        }


def _mont_mul_ops(n_elems: float, L: int) -> tuple[float, float]:
    """CIOS Montgomery multiply: ~2*L^2 u32 muls and ~4*L^2 adds/shifts."""
    return 2.0 * L * L * n_elems, 4.0 * L * L * n_elems


def sumcheck_round_model(n_log2: int, L: int = 16) -> KernelModel:
    """Fused fold + half-sums at 2^n (the MXU digit-matmul kernel,
    fields/mxu_mul.py): read N rows, write N/2.  The lerp's limb products
    ride the MXU as a [2L, 8L] x [8L, block] bf16 matmul (8L*2L MACs per
    output element); the VPU keeps only the epilogue (carry propagation,
    one-hot correction, conditional subtracts -- ~40 ops/limb)."""
    N = 1 << n_log2
    out = N / 2
    return KernelModel(
        name=f"sumcheck_round 2^{n_log2}",
        bytes_moved=(N + N / 2) * L * 4,
        u32_muls=0.0,
        u32_adds=40.0 * out * L,  # epilogue carries/selects
        mxu_macs=out * (8 * L) * (2 * L),
    )


def ntt_model(n_log2: int, L: int = 16, radix_log2: int = 5) -> KernelModel:
    """Multi-pass six-step NTT with radix-2^5 MXU DFT passes
    (fields/mxu_mul.dft_mxu): each pass streams the table through one digit
    matmul (m*4L x 2L MACs per element) plus the XLA digit-reorder transpose
    (counted as an extra memory pass); pre-twiddle CIOS multiplies stay on
    the VPU for passes >= 1."""
    N = 1 << n_log2
    passes = -(-n_log2 // radix_log2)
    m = 1 << radix_log2
    macs = N * passes * (m * 4 * L) * 2 * L / m  # per elem: 4L*2L*m / m outputs
    mul_t, add_t = _mont_mul_ops(N * (passes - 1), L)  # pre-twiddles (VPU)
    return KernelModel(
        name=f"ntt fwd 2^{n_log2}",
        bytes_moved=2.0 * N * L * 4 * (2 * passes),  # kernel + reorder passes
        u32_muls=mul_t,
        u32_adds=add_t + 40.0 * N * passes * L,  # epilogue carries/selects
        mxu_macs=macs,
    )


def msm_model(n_log2: int, L13: int = 20) -> KernelModel:
    """Pippenger signed-digit MSM: ~53 complete EC adds per point (52 digit
    windows + tail), each 12 Montgomery multiplies in the radix-2^13 domain."""
    N = 1 << n_log2
    ec_adds = 53.0 * N
    mul_m, add_m = _mont_mul_ops(12.0 * ec_adds, L13)
    return KernelModel(
        name=f"msm 2^{n_log2}",
        bytes_moved=N * (3 + 1) * L13 * 4,  # points + scalar codes, one pass
        u32_muls=mul_m,
        u32_adds=add_m + 12 * ec_adds * L13,
    )


def fri_model(n_log2: int, rounds: int, L: int = 16) -> KernelModel:
    """FRI commit: per round hash the codeword (Keccak, ~38 u32 ops/byte/24
    rounds ~ 900 op/32B lane) + fold to half size (1 mont_mul per pair)."""
    total_elems = sum((1 << (n_log2 - r)) for r in range(rounds))
    mul_m, add_m = _mont_mul_ops(total_elems / 2, L)
    keccak_ops = total_elems * 32 * 60  # ~60 u32 ops per state byte
    return KernelModel(
        name=f"fri prove 2^{n_log2}",
        bytes_moved=3.0 * total_elems * L * 4,
        u32_muls=mul_m,
        u32_adds=add_m + keccak_ops,
    )


def gkr_layer_model(depth: int, L: int = 16) -> KernelModel:
    """Sparse GKR tree prove: per layer two phase-table builds (~5 mont_muls
    per gate) + 2s sumcheck rounds over [2,2,S] working sets (t=0..2 evals +
    fold: ~16 mont_muls per row per round)."""
    gates = (1 << depth) - 1
    rows = sum((1 << s) * 2 * s * 16 for s in range(1, depth + 1))  # round work
    mul_m, add_m = _mont_mul_ops(5.0 * gates + rows / 4, L)
    return KernelModel(
        name=f"sparse gkr 2^{depth} tree",
        bytes_moved=rows * L * 4,
        u32_muls=mul_m,
        u32_adds=add_m,
    )


def render_markdown(rows: list[dict]) -> str:
    out = [
        "# Speed-of-light table (TPU v5e, one chip)",
        "",
        "Generated by `bench.py`.  Roofline = max(memory floor, compute floor);",
        f"model constants: HBM {HBM_BYTES_PER_S/1e9:.0f} GB/s (measured copy ceiling),",
        f"VPU ~{VPU_U32_MUL_PER_S/1e12:.1f}e12 u32 mul/s, ~{VPU_U32_ADD_PER_S/1e12:.1f}e12 u32 add/s, MXU ~{MXU_BF16_MACS_PER_S/1e12:.0f}e12 bf16 MAC/s.",
        "",
        "| kernel | bound | bytes | u32 muls | roofline (ms) | measured (ms) | % of SoL |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['kernel']} | {r['bound']} | {r['bytes_moved']/1e6:.0f} MB "
            f"| {r['u32_muls']/1e9:.2f} G | {r['t_roofline_ms']:.2f} "
            f"| {r['t_measured_ms']:.2f} | {r['pct_of_sol']:.1f}% |"
        )
    out.append("")
    return "\n".join(out)
