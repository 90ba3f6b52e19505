"""Measured-best query configurations per engine/scale.

The reference exposes one query path and leaves tuning to the caller
(src/kphf/sshash.rs:494-552 runs the same probe everywhere). On TPU the
deployment space is wider — layout kinds, probe depth, deferred
validation, truncated MPHF chains — and every choice here was measured
on the bench chip (STATUS.md rounds 1-3). This module encodes the
results so drivers/CLI/users get the tuned configuration without
re-deriving it:

- speed tier (index fits HBM comfortably): fused inline2 rows — the
  110.9M q/s bench layout.
- capacity tier (Gbp-scale; packed IntVector positions): direct engine
  3.07M q/s at 300Mbp / 2.78M at 1Gbp; fast32 engine 2.06M with
  defer_valid + mphf_level_limit=4 (the BooPHF chain attribution showed
  121-355ms/1M-chunk — truncating it was a first-order win).
- prefix kind by bucket count: flat32 (8-12B/bucket, 1-gather bounds)
  until the bucket table itself threatens the HBM budget, then
  grouped16 (2.06B/bucket, ~3 cheap gathers — measured only ~5% slower
  at 300Mbp and the only 3Gbp-fit; 1Gbp flat32 measured OOM).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Measured footprints (bytes/unit) — STATUS.md round-2/3 tables.
# PROVENANCE: every constant below was measured on the 2026-08 bench chip
# (v5e-class, ~7.7GB usable HBM, axon tunnel). On a new device,
# device_hbm_budget() re-derives the budget from the runtime; the
# bytes-per-unit footprints are layout properties (device-independent);
# the plim/w thresholds are gather-cost trade-offs — re-run
# labs/tpu_gbp_r3.py sweeps before trusting them on different HBM.
_SPEED_BYTES_PER_KMER = 21  # sshash direct inline2 load=0.25: ~1.04GB/50Mbp
_FLAT32_BYTES_PER_BUCKET = 12  # flat + flat2 pair arrays
# bench chip: 8.35GB of arrays PLACED and ran the validation graph
# (STATUS r4 usable-HBM note) — the binding constraint is arrays + the
# compiled query graph's workspace, modeled separately below.
_FALLBACK_HBM_TOTAL = int(8.4e9)
# the OneGraph CH-scan at 1M lanes needs ~1.5-2GB of graph workspace
# (STATUS r4: 8.35GB of arrays place and VALIDATE but the throughput
# graph RESOURCE_EXHAUSTs; 5.94GB runs) — capped at 20% for small
# explicitly-passed budgets, where it reduces to the old 0.8 margin.
_GRAPH_WORKSPACE = int(2.0e9)


def device_hbm_budget(device=None) -> int:
    """Total usable HBM on ``device`` (default: the first addressable
    device) for index arrays PLUS the compiled query graph's workspace
    (``tuned_query_config`` subtracts the workspace model itself —
    ADVICE r4: the old arrays-only margin let configs place and validate
    but OOM at query time).

    Resolution order: ``MAZU_HBM_BUDGET`` env override (bytes) →
    ``device.memory_stats()['bytes_limit']`` × 0.97 (allocator slack) →
    the measured bench-chip fallback. CPU/interpret backends report no
    stats and get the fallback — fine, since layout decisions only
    matter where HBM is real."""
    import os

    env = os.environ.get("MAZU_HBM_BUDGET")
    if env:
        return int(float(env))
    try:
        if device is None:
            import jax

            device = jax.devices()[0]
        stats = device.memory_stats()
        limit = int(stats.get("bytes_limit", 0)) if stats else 0
        if limit > 0:
            return int(limit * 0.97)
    except Exception:
        pass
    return _FALLBACK_HBM_TOTAL


def _arrays_budget(hbm_budget: int) -> int:
    """Bytes available for index arrays after the query-graph workspace
    reserve (min(2GB, 20%) — for small explicit budgets this reduces to
    the original 0.8 margin; for real chips it subtracts the measured
    ~2GB OneGraph workspace)."""
    return hbm_budget - min(_GRAPH_WORKSPACE, int(0.2 * hbm_budget))


@dataclass
class QueryConfig:
    """Layout + query knobs for the compact/padded drivers. Split into
    the two call sites: ``arrays_kwargs`` feeds
    ``ModIndex.device_arrays`` / ``SSHash.device_arrays``;
    ``query_kwargs`` feeds ``get_ref_pos_compact`` /
    ``OneGraphIndexQuery`` / ``PipelinedIndexQuery``."""

    tier: str  # "speed" | "capacity" | "mono"
    pos_kind: str | None = None
    prefix_kind: str | None = None
    fused: bool = False
    uproj: bool = False
    useqrec: bool = False
    bucket_inline: bool = False
    probe_limit: int | None = 2
    probe_limit2: int | None = None
    defer_valid: bool = False
    mphf_level_limit: int | None = None
    why: list[str] = field(default_factory=list)

    def arrays_kwargs(self) -> dict:
        out: dict = {}
        if self.pos_kind is not None:
            out["pos_kind"] = self.pos_kind
        if self.prefix_kind is not None:
            out["prefix_kind"] = self.prefix_kind
        if self.uproj:
            out["uproj"] = True  # ModIndex.device_arrays only (needs u2pos)
        if self.useqrec:
            out["useqrec"] = True  # ModIndex.device_arrays only
        if self.bucket_inline:
            out["bucket_inline"] = True
        return out

    def query_kwargs(self) -> dict:
        return {
            "probe_limit": self.probe_limit,
            "probe_limit2": self.probe_limit2,
            "defer_valid": self.defer_valid,
            "mphf_level_limit": self.mphf_level_limit,
        }


def tuned_query_config(k2u, hbm_budget: int | None = None) -> QueryConfig:
    """Pick the measured-best tier + knobs for a built K2U dictionary.

    ``hbm_budget`` is the device-bytes allowance for the whole index
    (default: introspected from the runtime device via
    ``device_hbm_budget``; pass the per-device budget when sharding)."""
    if hbm_budget is None:
        hbm_budget = device_hbm_budget()
    kind = type(k2u).__name__.lower()
    if "kcdict" in kind or hasattr(k2u, "slot_words"):
        # mono/mono2: single-hash one-gather engine; no layout kinds.
        return QueryConfig(
            tier="mono",
            why=["mono2-occ32: 104.8-110.9M q/s cached, 29.8M uncached (STATUS r2)"],
        )

    n_kmers = int(getattr(k2u, "n_kmers", 0))
    why: list[str] = []
    avail = _arrays_budget(hbm_budget)

    speed_bytes = n_kmers * _SPEED_BYTES_PER_KMER
    if speed_bytes <= avail:
        why.append(
            f"speed tier: inline2 fused rows ~{speed_bytes/1e9:.2f}GB fits "
            f"budget ({hbm_budget/1e9:.1f}GB) — 54-110M q/s class"
        )
        return QueryConfig(
            tier="speed", pos_kind="inline2", fused=True, probe_limit=2, why=why
        )

    # Capacity tier: packed IntVector positions.
    direct = bool(getattr(k2u, "direct_T", None))
    n_buckets = (
        int(k2u.direct_T) if direct else int(getattr(k2u, "n_minimizers", n_kmers))
    )
    flat32_bytes = n_buckets * _FLAT32_BYTES_PER_BUCKET
    if flat32_bytes <= 0.25 * hbm_budget:
        prefix_kind = "flat32"
        why.append(
            f"flat32 bounds: {n_buckets/1e6:.0f}M buckets = "
            f"{flat32_bytes/1e9:.2f}GB, 1-gather bounds (+~5% q/s vs grouped16)"
        )
    else:
        prefix_kind = "grouped16"
        why.append(
            f"grouped16 bounds: {n_buckets/1e6:.0f}M buckets — flat32 would be "
            f"{flat32_bytes/1e9:.2f}GB (1Gbp flat32 measured OOM); 2.06B/bucket"
        )
    if direct:
        # Deep merged buckets (small w) need plim=3 (STATUS r3: 2.61M at
        # plim=3 vs 2.42M at plim=2, 300Mbp w=15); wide-w Gbp builds are
        # shallow and plim=2 wins (1Gbp w=17: 2.78M vs 2.59M).
        w = int(getattr(k2u, "w", 15))
        plim = 2 if w >= 17 else 3
        # round-4 gather-OP diet: when the bpos bucket-inline table
        # (16 B/bucket) + useqrec window records (1.75 B/base) fit next
        # to the lean packed base, the main phase is 1+plim gather ops —
        # 8.10M q/s at 300Mbp, 5.49M at 1Gbp measured (STATUS r4).
        total_len = int(getattr(getattr(k2u, "unitigs", None), "total_len", 0))
        try:
            # real packed-array bytes (ADVICE r4: the 3 B/k-mer constant
            # overestimated 1Gbp by ~40%); ×1.2 covers the paired useq
            # words the packed device layout adds (measured ×1.0-1.16)
            lean = int(k2u.num_bits() // 8 * 1.2)
        except Exception:
            lean = n_kmers * 3  # measured lean packed base ~2-3 B/k-mer
        rich = lean + 16 * n_buckets + int(1.75 * total_len)
        if total_len and total_len < (1 << 31) and rich <= avail:
            why.append(
                f"bpos+useqrec fit: ~{rich/1e9:.2f}GB of "
                f"{avail/1e9:.1f}GB array budget (workspace reserved) — "
                f"1+plim gather-op main phase (8.1M q/s @300Mbp measured)"
            )
            # probe depth follows average bucket OCCUPANCY, not w:
            # 300Mbp load~0.7 measured plim=2 best (8.10M vs 7.18M at
            # 3); 1Gbp load~1.0 (deeper merged buckets) plim=3 best
            # (5.49M vs 4.34M)
            occs = int(getattr(k2u, "n_minimizer_occs", 0)) or n_kmers
            bplim = 2 if occs <= n_buckets else 3
            # middle-phase depth plim+2 (re-measured round 5 with the
            # m2c truncation guard: p2x3's apparent 8.96M was residue
            # truncation — honest p2x3 is 6.86M vs 8.0-8.1M at p2x4 on
            # 300Mbp; 1Gbp p2x5 5.49M, STATUS r4)
            bplim2 = bplim + 2
            why.append(
                f"bucket occupancy {occs/max(n_buckets,1):.2f} -> "
                f"probe_limit={bplim} + middle phase {bplim2}"
            )
            return QueryConfig(
                tier="capacity",
                pos_kind="packed",
                prefix_kind=prefix_kind,
                useqrec=True,
                bucket_inline=True,
                probe_limit=bplim,
                probe_limit2=bplim2,
                why=why,
            )
        why.append(f"direct engine, w={w}: probe_limit={plim}, defer_valid")
        why.append("uproj records: 1-gather tail (round-4 gather diet)")
        return QueryConfig(
            tier="capacity",
            pos_kind="packed",
            prefix_kind=prefix_kind,
            uproj=True,
            probe_limit=plim,
            defer_valid=True,
            why=why,
        )
    why.append(
        "MPHF engine: defer_valid + mphf_level_limit=4 (+43% measured — "
        "the full BooPHF chain was the largest main-phase cost)"
    )
    why.append("uproj records: 1-gather tail (round-4 gather diet)")
    return QueryConfig(
        tier="capacity",
        pos_kind="packed",
        prefix_kind=prefix_kind,
        uproj=True,
        probe_limit=2,
        defer_valid=True,
        mphf_level_limit=4,
        why=why,
    )
