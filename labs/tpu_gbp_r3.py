"""Round-3 TPU session: Gbp-scale COMPACT tier with the two-phase driver.

Round 2 proved the 1Gbp compact index (fast32 engine, packed IntVector
positions) is exact on chip but slow through the one-kernel PADDED query:
0.41M q/s at skew=4 (15% skew traffic) and 0.24M at skew=64 (every lane
pays the probe_bound=64 loop). This session runs the same index through
get_ref_pos_compact with the TYPE-SPLIT heavy phase (shallow main probe
batch-wide; deep/skew lanes compacted on device and re-probed from
probe_start=plim) inside the OneGraphIndexQuery scan driver.

Also the 3Gbp HUMAN-SCALE fit: prefix_kind="grouped16" drops the flat32
bucket prefix (12B/minimizer incl. flat2 pairs) to ~2.06B/minimizer at a
~3-gather bounds cost (EF would be ~0.4B but its device select is a
~23-gather binary search per bound), so a 3Gbp index fits one chip.

Env knobs: MAZU_GBP_BASES (1e9), MAZU_GBP_SKEW (64), MAZU_GBP_PREFIX
(grouped16), MAZU_GBP_PLIM (2), MAZU_GBP_CH (8), MAZU_GBP_ITERS (5),
MAZU_GBP_CKPT (load a host_gbp_build.py checkpoint instead of building).

Run: timeout 7200 python tpu_gbp_r3.py   (3Gbp needs ~2h host build)
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("MAZU_BUILD_TIMING", "1")
    cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    import jax

    if os.environ.get("MAZU_GBP_CPU"):  # small-scale smoke run off-chip
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import bench
    from mazu_tpu.index.modindex import ModIndex, get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.kmer import revcomp
    from mazu_tpu.kphf.sshash import SSHash
    from mazu_tpu.pytree import tree_bytes

    NB = int(os.environ.get("MAZU_GBP_BASES", 1_000_000_000))
    PIECE = 10_000
    k = 31
    ckpt = os.environ.get("MAZU_GBP_CKPT")
    if ckpt:
        from mazu_tpu.io.checkpoint import load_index

        t0 = time.time()
        index = load_index(ckpt)
        k2u, u2pos, refs = index.k2u, index.u2pos, index.refs
        unitigs = k2u.unitigs
        NB = unitigs.total_len
        log(f"loaded {ckpt} in {time.time()-t0:.0f}s: {unitigs.n_kmers} kmers")
    else:
        t0 = time.time()
        unitigs, refs, u2pos = bench.build_synthetic(NB)
        log(f"synth {NB/1e9:.2f}Gbp in {time.time()-t0:.0f}s: {unitigs.n_kmers} kmers")
        t0 = time.time()
        skew = int(os.environ.get("MAZU_GBP_SKEW", 64))
        k2u = SSHash.from_unitig_set(unitigs, w=15, skew_param=skew, engine="fast32")
        log(
            f"fast32 build {time.time()-t0:.0f}s: bits/kmer="
            f"{k2u.num_bits()/k2u.n_kmers:.2f} skew_kmers={k2u.n_kmers_in_skew_index}"
        )
        index = ModIndex(k2u, u2pos, refs)
    plims = [int(p) for p in os.environ.get("MAZU_GBP_PLIM", "2").split(",")]
    uprojs = [
        v != "0" for v in os.environ.get("MAZU_GBP_UPROJ", "1").split(",")
    ]
    for prefix_kind in os.environ.get("MAZU_GBP_PREFIX", "grouped16").split(","):
        for up in uprojs:
            run_prefix(
                prefix_kind, index, k2u, u2pos, refs, unitigs, NB, PIECE, k,
                plims, uproj=up,
            )


def run_prefix(
    prefix_kind, index, k2u, u2pos, refs, unitigs, NB, PIECE, k, plims=(2,), uproj=True
):
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.kmer import revcomp
    from mazu_tpu.pytree import tree_bytes

    log(f"==== prefix_kind={prefix_kind} ====")
    t0 = time.time()
    from mazu_tpu.pytree import meta as make_meta

    host_arrays = {
        "k2u": k2u.device_arrays(
            prefix_kind=prefix_kind, pos_kind="packed",
            bucket_inline=bool(os.environ.get("MAZU_GBP_BPOS")),
            # round 5: paired word|rank MPHF rows — a truncated BooPHF32
            # lookup becomes mlim gather OPS with no rank tail (drops the
            # words/ranks arrays; see kphf/boophf32.device_arrays)
            mphf_rows=bool(os.environ.get("MAZU_GBP_MROWS")),
        ),
        "u2pos": u2pos.device_arrays(),
        "refs": refs.device_arrays(),
        # just the static top-level meta — index.device_arrays() would
        # build the DEFAULT inline layout, which asserts total_len < 2^31
        # (3Gbp is past it; the packed capacity layout has no such limit)
        "meta": make_meta(k=index.k, index_type=index.index_type),
    }
    host_arrays["refs"].pop("seq", None)  # workload sampling stays host-side
    if uproj:
        # round-4 gather diet: per-unitig projection records (one 40B row
        # gather replaces extent + offsets pair + width-2 ctable fetch and
        # makes the main projection zero-gather; MAZU_GBP_UPROJ=0,1 to A/B)
        from mazu_tpu.index.modindex import build_uproj

        host_arrays["k2u"]["us"]["uproj"] = build_uproj(u2pos, unitigs)
        log(f"uproj records: {host_arrays['k2u']['us']['uproj'].nbytes/1e6:.1f} MB")
    if os.environ.get("MAZU_GBP_USREC"):
        # round-4 window-record probe: validation + rank + projection ride
        # the candidate fetch (1.75 B/base; the <=1Gbp speed-at-capacity
        # layout — see build_useqrec)
        from mazu_tpu.index.modindex import build_useqrec

        host_arrays["k2u"]["us"]["useqrec"] = build_useqrec(u2pos, unitigs)
        log(
            f"useqrec records: "
            f"{host_arrays['k2u']['us']['useqrec'].nbytes/1e9:.2f} GB"
        )
    if os.environ.get("MAZU_GBP_DROP_FLAT") and "words2" in host_arrays["k2u"]["us"]["useq"]:
        # paired words2 serves every query-path read; the flat words copy
        # is only the fallback branch — dropping it saves ~0.75 GB at 3Gbp
        host_arrays["k2u"]["us"]["useq"].pop("words")
    if os.environ.get("MAZU_GBP_LEAN"):
        # 3Gbp single-chip fit: drop the PAIRED layouts instead (probe
        # pays +1 gather op per iteration, validate falls back to the
        # plain boundary-bv window) — words2+wb2 are ~2.25 GB at 3Gbp
        us_ = host_arrays["k2u"]["us"]
        if "words2" in us_["useq"]:
            if "words" not in us_["useq"]:
                us_["useq"]["words"] = np.ascontiguousarray(
                    us_["useq"]["words2"][:, 0]
                )
            us_["useq"].pop("words2")
        us_["bv"].pop("wb2", None)
        log("LEAN: dropped words2/wb2 paired layouts")
    log(
        f"host arrays ({prefix_kind}) {time.time()-t0:.0f}s, device footprint "
        f"{tree_bytes(host_arrays)/1e9:.2f} GB"
    )
    t0 = time.time()
    arrays = jax.device_put(host_arrays)
    jax.block_until_ready(arrays)
    log(f"device placement {time.time()-t0:.0f}s")

    # uniform 1M-query sample with ground truth
    B = int(os.environ.get("MAZU_GBP_BATCH", 1 << 20))
    rng = np.random.default_rng(0)
    upos = rng.integers(0, PIECE - k + 1, B)
    uid = rng.integers(0, unitigs.n_unitigs, B)
    gpos = uid * PIECE + upos
    kms = unitigs.useq.get_kmer_u64(gpos, k)
    flip = rng.random(B) < 0.5
    kms[flip] = revcomp(kms[flip], k)

    if os.environ.get("MAZU_GBP_ATTR"):
        for plim in plims:
            run_attr(prefix_kind, index, arrays, kms, B, plim)
        return

    defers = [
        bool(int(v)) for v in os.environ.get("MAZU_GBP_DEFER", "0").split(",")
    ]
    mlims = [
        (int(v) if v else None)
        for v in os.environ.get("MAZU_GBP_MLIM", "").split(",")
    ]
    for plim in plims:
        for dv in defers:
            for mlim in mlims:
                run_plim(
                    plim, prefix_kind, index, arrays, host_arrays, kms,
                    uid, upos, B, NB, dv, mlim,
                )


def run_attr(prefix_kind, index, arrays, kms, B, plim):
    """Per-stage cost attribution of the compact-tier query (CH-scanned
    like the bench pass; deltas between stages = that stage's cost):
      A  minimizer + canon                      (compute only)
      B  A + full MPHF lookup                   (chain + final-hash search)
      B2 A + truncated MPHF (level_limit=4)     (the mphf_level_limit path)
      C  main k2u probe (plim, defer, mlim)     (bounds + probe loop + map)
      D  C + offsets projection                 (+2 gathers)
      F  full compact pass                      (+compaction + phases 2/2B)
    """
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.index.twophase import _project_offsets
    from mazu_tpu.kmer import canonical_minimizer_batch
    from mazu_tpu.kphf.sshash import mphf_lookup, sshash_k2u

    meta = arrays["k2u"]["meta"]
    ordering = getattr(meta, "ordering", None)
    CH = int(os.environ.get("MAZU_GBP_CH", 8))
    # same default as run_prefix/run_plim so MAZU_GBP_ATTR=1 attributes the
    # SAME configuration the bench measured
    dv = bool(int(os.environ.get("MAZU_GBP_DEFER", "0").split(",")[0]))
    ml = os.environ.get("MAZU_GBP_MLIM", "4").split(",")[0]
    mlim = int(ml) if ml else None
    mo = max(1, index.max_occs())
    d_kms = jax.device_put(jnp.asarray(kms))
    log(f"==== ATTR prefix={prefix_kind} plim={plim} defer={dv} mlim={mlim} CH={CH} ====")

    def scan_over(chunk_fn):
        def run(arrays, work):
            def step(carry, i):
                chunk = jnp.roll(work, i * jnp.int64(40009))
                return carry + chunk_fn(arrays, chunk), 0
            tot, _ = jax.lax.scan(
                step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64)
            )
            return tot
        return run

    def timeit(tag, fn, iters=5):
        f = jax.jit(scan_over(fn))
        jax.device_get(f(arrays, d_kms))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            o = f(arrays, d_kms)
        jax.device_get(o)
        dt = (time.time() - t0) / iters / CH
        log(f"[{tag:34s}] {dt*1e3:8.2f} ms/{B>>20}M chunk")

    def stage_a(arrays, fw):
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, meta.k, meta.w, meta.seed, hash32=meta.hash32,
            ordering=ordering,
        )
        return mm.astype(jnp.int64).sum() + offset.astype(jnp.int64).sum()

    def stage_b(arrays, fw):
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, meta.k, meta.w, meta.seed, hash32=meta.hash32,
            ordering=ordering,
        )
        h = mphf_lookup(arrays["k2u"]["mphf"], mm, jnp)
        return h.astype(jnp.int64).sum() + offset.astype(jnp.int64).sum()

    def stage_b2(arrays, fw):
        d = arrays["k2u"]
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, meta.k, meta.w, meta.seed, hash32=meta.hash32,
            ordering=ordering,
        )
        h, unres = mphf_lookup(d["mphf"], mm, jnp, level_limit=4)
        return (
            h.astype(jnp.int64).sum()
            + unres.astype(jnp.int64).sum()
            + offset.astype(jnp.int64).sum()
        )

    def stage_c(arrays, fw):
        r = sshash_k2u(
            arrays["k2u"], fw, jnp, mode="main", probe_limit=plim,
            defer_valid=dv, mphf_level_limit=mlim,
        )
        return (
            r["unitig_id"].sum()
            + r["pos"].sum()
            + r["mt"].astype(jnp.int64).sum()
            + r["use_skew"].astype(jnp.int64).sum()
            + r["unresolved"].astype(jnp.int64).sum()
        )

    def stage_d(arrays, fw):
        r = sshash_k2u(
            arrays["k2u"], fw, jnp, mode="main", probe_limit=plim,
            defer_valid=dv, mphf_level_limit=mlim,
        )
        p = _project_offsets(arrays, r, jnp, small_occs=2)
        return (
            jnp.where(p["valid"], p["ref_pos"], 0).sum()
            + jnp.where(p["valid"], p["ref_id"], 0).sum()
            + p["overflow"].astype(jnp.int64).sum()
        )

    def stage_f(arrays, fw):
        out = get_ref_pos_compact(
            arrays, fw, jnp, mo, merge=False, probe_limit=plim,
            m2=max(8192, B // 8), m2b=max(8192, B // 8),
            defer_valid=dv, mphf_level_limit=mlim,
        )
        return OneGraphIndexQuery.checksum(out, jnp)

    for tag, fn in (
        ("A minimizer+canon", stage_a),
        ("B +full MPHF lookup", stage_b),
        ("B2 +truncated MPHF (ll=4)", stage_b2),
        ("C main k2u (plim,defer,mlim)", stage_c),
        ("D +offsets projection", stage_d),
        ("F full compact pass", stage_f),
    ):
        try:
            timeit(tag, fn)
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")


def run_plim(plim, prefix_kind, index, arrays, host_arrays, kms, uid, upos, B, NB, dv, mlim=None):
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery

    log(f"---- plim={plim} defer_valid={dv} mphf_level_limit={mlim} ----")
    mo = max(1, index.max_occs())
    from mazu_tpu.index.twophase import _project_offsets
    from mazu_tpu.kphf.sshash import sshash_k2u

    # cheap MAIN-ONLY count pass first: at 3Gbp a full-capacity validation
    # probe OOMs the chip (padded phase-2 over B lanes next to a ~6GB
    # index), and a fixed fraction guesses wrong when bucket depths shift
    @jax.jit
    def count_ovf(arrays, kms):
        r = sshash_k2u(
            arrays["k2u"], kms, jnp, mode="main", probe_limit=plim,
            defer_valid=dv, mphf_level_limit=mlim,
        )
        p = _project_offsets(arrays, r, jnp, small_occs=2)
        ovf_b = r["use_skew"] | r["unresolved"]
        ovf_a = p["overflow"] & ~ovf_b
        return ovf_a.sum(), ovf_b.sum()

    d_kms0 = jax.device_put(jnp.asarray(kms))
    na0, nb0 = (int(x) for x in jax.device_get(count_ovf(arrays, d_kms0)))
    log(f"main-only count: type-A {na0}, type-B {nb0} of {B}")
    fit0 = lambda c: max(8192, -(-(int(c) + 512) // 4096) * 4096)  # noqa: E731
    M2_0, M2B_0 = fit0(na0 * 1.02), fit0(nb0 * 1.02)

    plim2 = int(os.environ.get("MAZU_GBP_PLIM2", 0)) or None
    M2C_0 = None
    if plim2:
        # residue sizing: batch-wide count of skew/deeper-than-plim2 lanes
        # (a tight upper bound on the middle phase's residue)
        @jax.jit
        def count_ovf2(arrays, kms):
            r = sshash_k2u(arrays["k2u"], kms, jnp, mode="main", probe_limit=plim2)
            return (r["use_skew"] | r["unresolved"]).sum()

        nc0 = int(jax.device_get(count_ovf2(arrays, d_kms0)))
        M2C_0 = fit0(nc0 * 1.05 + 64)
        log(f"residue count at plim2={plim2}: {nc0} of {B}")

    @jax.jit
    def probe(arrays, kms):
        return get_ref_pos_compact(
            arrays, kms, jnp, mo, merge=False, probe_limit=plim,
            m2=M2_0, m2b=M2B_0, defer_valid=dv, mphf_level_limit=mlim,
            probe_limit2=plim2, m2c=M2C_0,
        )

    d_kms = jax.device_put(jnp.asarray(kms))
    t0 = time.time()
    out = jax.device_get(probe(arrays, d_kms))
    log(f"validation pass compile+first+download {time.time()-t0:.0f}s")
    assert not bool(out["over_budget"]), "validation capacities exceeded"
    n_a, n_b = int(out["n_ovf"]), int(out["n_ovf_b"])
    log(f"overflow: type-A (occ-wide) {n_a}, type-B (deep/skew) {n_b} of {B}")

    # ---- exact ground-truth merge on host
    m_ = out["main"]
    muid = np.asarray(m_["unitig_id"]).copy()
    mpos = np.asarray(m_["pos"]).copy()
    mmt = np.asarray(m_["mt"]).copy()
    mrp = np.where(np.asarray(m_["valid"]), np.asarray(m_["ref_pos"]), -1)[:, 0].copy()
    for pk, lk, sk in (("phase2", "lanes", "slot_real"), ("phase2b", "lanes_b", "slot_real_b")):
        p2 = out[pk]
        real = np.asarray(out[sk])
        lanes = np.asarray(out[lk])[real]
        muid[lanes] = np.asarray(p2["unitig_id"])[real]
        mpos[lanes] = np.asarray(p2["pos"])[real]
        mmt[lanes] = np.asarray(p2["mt"])[real]
        mrp[lanes] = np.where(
            np.asarray(p2["valid"]), np.asarray(p2["ref_pos"]), -1
        )[real][:, 0]
    assert (mmt > 0).all(), f"misses: {(mmt == 0).sum()}"
    np.testing.assert_array_equal(muid, uid)
    np.testing.assert_array_equal(mpos, upos)
    np.testing.assert_array_equal(mrp, upos)  # ref == unitig in this synth
    # foreign probes must miss
    fo = jax.device_get(
        probe(arrays, jnp.full(B, np.uint64(0x3FF3FF3FF3FF3FF), jnp.uint64))
    )
    fmt = np.asarray(fo["main"]["mt"]).copy()
    for pk, lk, sk in (("phase2", "lanes", "slot_real"), ("phase2b", "lanes_b", "slot_real_b")):
        real = np.asarray(fo[sk])
        fmt[np.asarray(fo[lk])[real]] = np.asarray(fo[pk]["mt"])[real]
    assert (fmt == 0).all()
    log(f"EXACT: all {B} sampled queries (fw+rc) + foreign misses clean")

    up = "_uproj" if "uproj" in host_arrays["k2u"]["us"] else ""
    if "useqrec" in host_arrays["k2u"]["us"]:
        up += "_usrec"
    if "bpos" in host_arrays["k2u"]:
        up += "_bpos"
    if "mrows" in host_arrays["k2u"].get("mphf", {}):
        up += "_mrows"

    if os.environ.get("MAZU_GBP_ONEGRAPH", "1") == "0":
        # OOM fallback (round 5): the CH-scan OneGraph needs ~1.5-2 GB of
        # graph workspace that a >6.5 GB placement leaves no room for
        # (3Gbp + mrows RESOURCE_EXHAUSTed at B=1M AND B=512K). Pipeline
        # the single-pass jit from Python instead — dispatch is async, one
        # sync at the end — with outputs REDUCED to scalars on device
        # (tunnel transfers run ~27 MB/s; full outputs would dominate).
        # Exactness was already proven above; the rolled operand keeps the
        # multiset identical so the permutation-invariant checksum must
        # not vary across passes.
        @jax.jit
        def probe_red(arrays, kms):
            out = get_ref_pos_compact(
                arrays, kms, jnp, mo, merge=False, probe_limit=plim,
                m2=M2_0, m2b=M2B_0, defer_valid=dv, mphf_level_limit=mlim,
                probe_limit2=plim2, m2c=M2C_0,
            )
            m_ = out["main"]
            chk = (
                m_["mt"].astype(jnp.int64).sum()
                + m_["pos"].astype(jnp.int64).sum()
                + m_["unitig_id"].astype(jnp.int64).sum()
            )
            return chk, out["over_budget"]

        kk = [jnp.roll(d_kms, 7919 * i) for i in range(4)]
        jax.block_until_ready(kk)
        t0 = time.time()
        chk0, ob0 = (int(x) for x in jax.device_get(probe_red(arrays, kk[0])))
        log(f"pipelined fallback compile+first {time.time()-t0:.0f}s")
        assert not ob0, "capacities exceeded in fallback pass"
        iters = int(os.environ.get("MAZU_GBP_ITERS", 5)) * 4
        t0 = time.time()
        outs = [probe_red(arrays, kk[i % 4]) for i in range(iters)]
        res = jax.device_get(outs)
        dt = time.time() - t0
        for chk, ob in res:
            assert int(chk) == chk0 and not bool(ob), (int(chk), chk0)
        qps = B * iters / dt
        log(f"{iters} x {B} pipelined full queries in {dt:.2f}s -> {qps/1e6:.2f}M q/s")
        print(
            f'{{"metric": "compact_tier_qps_{NB}_{prefix_kind}_plim{plim}'
            f'{"_defer" if dv else ""}{f"_mlim{mlim}" if mlim else ""}'
            f'{f"_p2x{plim2}" if plim2 else ""}{up}_pipe", "value": {qps:.0f}, '
            f'"unit": "queries/s", "vs_baseline": {qps/1e9:.6f}}}'
        )
        return

    # ---- throughput: OneGraph CH-chunk scan with tight capacities
    CH = int(os.environ.get("MAZU_GBP_CH", 8))
    fit = lambda c: max(1024, -(-(int(c) + 256) // 1024) * 1024)  # noqa: E731
    M2, M2B = fit(n_a * 1.3), fit(n_b * 1.15)
    log(f"building OneGraph driver CH={CH} M2={M2} M2B={M2B} plim={plim}")
    og = OneGraphIndexQuery(
        index, B, n_chunks=CH, m2=M2, m2b=M2B, probe_limit=plim,
        host_arrays=host_arrays, defer_valid=dv, mphf_level_limit=mlim,
        probe_limit2=plim2,
        m2c=None if plim2 is None else fit(M2C_0 * 1.1),
    )
    t0 = time.time()
    chk0, worst = og.checksum_pass_rolled(d_kms)
    log(f"compile+first pass {time.time()-t0:.0f}s worst_ovf={worst}")
    wa, wb = worst
    assert wa <= M2 and wb <= M2B, f"capacity exceeded: {worst}"
    iters = int(os.environ.get("MAZU_GBP_ITERS", 5))
    t0 = time.time()
    for _ in range(iters):
        chk, _ = og.checksum_pass_rolled(d_kms)
        assert chk == chk0
    dt = time.time() - t0
    qps = B * CH * iters / dt
    log(
        f"{iters} x {CH}x{B} full queries in {dt:.2f}s -> {qps/1e6:.2f}M q/s "
        f"(chk={chk0})"
    )
    print(
        f'{{"metric": "compact_tier_qps_{NB}_{prefix_kind}_plim{plim}'
        f'{"_defer" if dv else ""}{f"_mlim{mlim}" if mlim else ""}'
        f'{f"_p2x{plim2}" if plim2 else ""}{up}", "value": {qps:.0f}, '
        f'"unit": "queries/s", "vs_baseline": {qps/1e9:.6f}}}'
    )


if __name__ == "__main__":
    main()
