"""Roofline ledger: the measured gather-cost model behind docs/ROOFLINE.md.

The query engines are gather-issue-bound on this platform (XLA lowers
random gathers to a serial per-row loop at ~14 ns/row regardless of HBM
bandwidth), so throughput is modeled as::

    ns/query = sum(gather costs on the main path) + compute_ns
    predicted q/s = 1e9 / ns/query  (x phase-2 overhead factor)

Constants are MEASURED on the bench chip (labs/tpu_gather_lab.py,
labs/tpu_rowlab.py, STATUS.md); re-measure on new hardware. The table
below is asserted consistent with the measured rates in tests — if a
bench result drifts >35% from the model, either the hardware changed or
an engine regressed; update BOTH this file and docs/ROOFLINE.md.

``python -m mazu_tpu.roofline`` prints the ledger.
"""

from __future__ import annotations

from dataclasses import dataclass

# ---- measured primitive costs, ns (2026-08-17/18, single bench chip) ----
ELEM_GATHER_NS = 9.0  # random element gather, any table size
ROW_GATHER_NS = 14.0  # random row gather, row <= 56 B, cached table
ROW_GATHER_UNCACHED_NS = 30.0  # same, table >> cache (HBM latency exposed)
ROW_512B_GATHER_NS = 110.0  # random 512 B row
SCATTER_NS = 75.0  # any conflict mode; serial lowering
MINIMIZER_SCAN_NS = 3.4  # 17-window mix32 canonical minimizer
COMPUTE_OVERHEAD_NS = 2.0  # residual vector math per query

HBM_GBPS = 819.0  # chip HBM bandwidth (spec class)
ROW_BYTES = 56.0


def speed_of_light_rows_per_s(efficiency: float = 0.25) -> float:
    """Row fetch rate a latency-covered DMA pipeline would sustain."""
    return HBM_GBPS * 1e9 * efficiency / ROW_BYTES


@dataclass(frozen=True)
class Tier:
    name: str
    gathers_cached: float  # random row gathers/query against cached tables
    gathers_uncached: float  # ... against uncached (>cache) tables
    cheap_gathers: float  # consecutive/grouped gathers (~2 ns each)
    phase2_factor: float  # multiplicative overhead from overflow phases
    measured_mqs: float | None  # measured M q/s (None = unmeasured)
    where: str

    def predicted_ns(self) -> float:
        return (
            self.gathers_cached * ROW_GATHER_NS
            + self.gathers_uncached * ROW_GATHER_UNCACHED_NS
            + self.cheap_gathers * 2.0
            + COMPUTE_OVERHEAD_NS
        ) * self.phase2_factor

    def predicted_mqs(self) -> float:
        return 1e3 / self.predicted_ns()


# The maintained ledger. measured_mqs values quote STATUS.md; the
# capacity-tier lever rows are updated each round as hardware numbers land.
TIERS = (
    Tier("speed cached (mono2-occ32 L=.25, chr01)", 0.55, 0.0, 0.5, 1.02, 110.9,
         "BENCH_r02 / STATUS r3"),
    Tier("speed uncached (mono2-occ32 L=.5, 50Mbp)", 0.0, 1.0, 0.5, 1.07, 29.8,
         "STATUS r2 scale table"),
    Tier("mid uncached (sshash direct, 50-300Mbp)", 0.0, 1.8, 1.0, 1.05, 16.5,
         "STATUS r2 scale curve (15.5-17.6M)"),
    Tier("capacity r2 (fast32+grouped16, 300Mbp, plim=2)", 0.0, 30.0, 6.0, 1.10, 1.03,
         "STATUS r3 compact-tier table"),
    # round-3 rebuild: direct engine (1 bounds gather, no MPHF), fused
    # candidate window + pos-window (1 pos + 3 candidate + 1 defer-valid
    # + 2 map + 2 projection random gathers), small phase 2b
    Tier("capacity r3 (direct+flat32 packed, 300Mbp, plim=3)", 0.0, 9.0, 4.0, 1.10,
         3.07, "STATUS r3 direct-engine table"),
    # round-4 gather-OP diet (the wall is per gather op; extraction ALU
    # free): bpos bucket-inline row (bounds + first-3 positions) + 2
    # useqrec window-record rows = 3 ops, middle-phase p2x4 overhead
    Tier("capacity r4 (direct+bpos+useqrec, 300Mbp, plim=2)", 0.0, 3.0, 1.0, 1.25,
         8.10, "STATUS r4 bpos/useqrec table"),
)


def report() -> str:
    lines = [
        f"{'tier':48s} {'pred ns':>8s} {'pred Mq/s':>10s} {'meas Mq/s':>10s}  where",
        "-" * 110,
    ]
    for t in TIERS:
        meas = f"{t.measured_mqs:.1f}" if t.measured_mqs else "—"
        lines.append(
            f"{t.name:48s} {t.predicted_ns():8.1f} {t.predicted_mqs():10.1f} "
            f"{meas:>10s}  {t.where}"
        )
    sol = speed_of_light_rows_per_s()
    lines += [
        "-" * 110,
        f"XLA gather wall: {1e3/ROW_GATHER_NS:.0f}M rows/s "
        f"({ROW_GATHER_NS * 1e-9 * 1e9:.0f} ns/row, ~{73e6*ROW_BYTES/1e9:.0f} GB/s "
        f"= {73e6*ROW_BYTES/HBM_GBPS/1e7:.1f}% of HBM)",
        f"DMA speed of light @25% eff: {sol/1e9:.1f}G rows/s "
        f"({1e9/sol:.2f} ns/row) -> 1e9 q/s needs a Pallas DMA-ring kernel "
        "(blocked: see docs/ROOFLINE.md §4)",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    print(report())
