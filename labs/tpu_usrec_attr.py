"""Round-4 fine-grained attribution of the capacity-tier MAIN phase.

The coarse ATTR (tpu_gbp_r3.py MAZU_GBP_ATTR=1) showed the main k2u
phase at ~238 ms/1M on the 300Mbp direct ckpt — 84% of the full query —
and identical for the uproj and useqrec layouts even though useqrec
removes 2-3 random gathers. This lab splits the main phase into
cumulative stages to find where those nanoseconds actually go:

  S0 minimizer+canon+hash       (pure VPU)
  S1 +bucket bounds             (grouped16/flat2 gathers)
  S2 +packed pos window         (_pos_window fetch + extraction)
  S3 +probe ROW gathers only    (usrec rows wi, wi+1; raw row sums)
  S4 +ONE full probe iteration  (extraction ALU + verify)
  S5 full main phase            (= sshash_k2u mode="main")
  A0 extraction-ALU control     (same candidate math on ROLLED local
                                 data, no random gathers — prices the
                                 u64-emulation VPU cost alone)

Run: MAZU_GBP_CKPT=... python tpu_usrec_attr.py
Env: MAZU_GBP_PREFIX (grouped16), MAZU_GBP_PLIM (2), MAZU_GBP_CH (8),
     MAZU_GBP_USREC (1)

Round-5 extension (VERDICT r4 weak #5: 123 ns/q vs the ~60-90 ns 3-op
model): MAZU_GBP_BPOS=1 switches to the committed bucket-inline layout
and adds the post-main split —

  S1b +bpos row               (the ONE bounds+positions gather)
  S3b +usrec rows             (raw probe-row gathers at bpos positions)
  S6 +compaction only         (main + flagged_lanes, no phase 2/2b)
  S7 full query               (get_ref_pos_compact, middle phase p2x4)

so the residual decomposes into main-ALU (S5-S3b), compaction (S6-S5)
and phase-2/2b+projection (S7-S6)."""

import _bootstrap  # noqa: F401

import os
import sys
import time

import numpy as np

U64 = np.uint64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import build_useqrec, build_uproj
    from mazu_tpu.io.checkpoint import load_index
    from mazu_tpu.kmer import canonical_minimizer_batch, revcomp, word_equivalency
    from mazu_tpu.kphf.boophf32 import fold_hash32
    from mazu_tpu.kphf.sshash import _pos_window, _prefix_get, sshash_k2u
    from mazu_tpu.pytree import tree_bytes

    ck = os.environ["MAZU_GBP_CKPT"]
    prefix_kind = os.environ.get("MAZU_GBP_PREFIX", "grouped16")
    plim = int(os.environ.get("MAZU_GBP_PLIM", 2))
    CH = int(os.environ.get("MAZU_GBP_CH", 8))
    use_bpos = os.environ.get("MAZU_GBP_BPOS", "0") == "1"
    B = 1 << 20

    t0 = time.time()
    index = load_index(ck)
    k2u, u2pos = index.k2u, index.u2pos
    unitigs = k2u.unitigs
    log(f"loaded {ck} {time.time()-t0:.0f}s")
    host = k2u.device_arrays(
        prefix_kind=prefix_kind, pos_kind="packed", bucket_inline=use_bpos
    )
    if os.environ.get("MAZU_GBP_USREC", "1") != "0":
        host["us"]["useqrec"] = build_useqrec(u2pos, unitigs)
    else:
        host["us"]["uproj"] = build_uproj(u2pos, unitigs)
    d = jax.device_put(host)
    log(f"device {tree_bytes(host)/1e9:.2f} GB (bpos={use_bpos})")

    m = host["meta"]
    k, w = m.k, m.w
    rng = np.random.default_rng(0)
    PIECE = 10_000
    upos = rng.integers(0, PIECE - k + 1, B)
    uid = rng.integers(0, unitigs.n_unitigs, B)
    kms = unitigs.useq.get_kmer_u64(uid * PIECE + upos, k)
    flip = rng.random(B) < 0.5
    kms[flip] = revcomp(kms[flip], k)
    d_kms = jax.device_put(jnp.asarray(kms))

    def scan_over(fn):
        def run(d, work):
            def step(c, i):
                return c + fn(d, jnp.roll(work, i * jnp.int64(40009))), 0

            t, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
            return t

        return run

    def timeit(tag, fn, iters=5):
        f = jax.jit(scan_over(fn))
        jax.device_get(f(d, d_kms))
        t0 = time.time()
        for _ in range(iters):
            o = f(d, d_kms)
        jax.device_get(o)
        dt = (time.time() - t0) / iters / CH
        log(f"[{tag:30s}] {dt*1e3:8.2f} ms/1M")

    ordering = getattr(m, "ordering", None)

    def prep(dd, fw):
        rc = revcomp(fw, k)
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, k, w, m.seed, hash32=m.hash32, ordering=ordering
        )
        hc = (fold_hash32(mm) & np.uint32(m.direct_t - 1)).astype(jnp.int64)
        return fw, rc, offset.astype(jnp.int64), hc

    def s0(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        return hc.sum() + offset.sum() + rc.astype(jnp.int64).sum()

    def bounds(dd, hc):
        if "flat2" in dd.get("prefix", {}):
            pair = dd["prefix"]["flat2"][hc]
            return pair[..., 0].astype(jnp.int64), pair[..., 1].astype(jnp.int64)
        ps = _prefix_get(dd, hc, jnp)
        pe = _prefix_get(dd, hc + 1, jnp)
        return ps, pe

    def s1(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        ps, pe = bounds(dd, hc)
        return ps.sum() + pe.sum() + offset.sum()

    def s2(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        ps, pe = bounds(dd, hc)
        win = _pos_window(dd, ps, plim, jnp)
        return sum(x.sum() for x in win) + pe.sum() + offset.sum()

    def s3(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        ps, pe = bounds(dd, hc)
        win = _pos_window(dd, ps, plim, jnp)
        rec = dd["us"]["useqrec"]
        nrec = rec.shape[0]
        acc = pe.sum() + offset.sum()
        for j in range(plim):
            mm_pos = win[j]
            base = jnp.clip(mm_pos - (k - w), 0, None)
            wi = (base * 2) >> 6
            r0 = rec[jnp.clip(wi, 0, nrec - 1)]
            r1 = rec[jnp.clip(wi + 1, 0, nrec - 1)]
            acc = acc + r0.astype(jnp.int64).sum(-1).sum() + r1[..., 1].astype(jnp.int64).sum()
        return acc

    def one_iter(dd, fw, rc, offset, ps, pe, win, j):
        rec = dd["us"]["useqrec"]
        nrec = rec.shape[0]
        last_km = int(host["us"]["meta"].total_len - k)
        rc_offset = k - offset - w
        mm_pos = win[j]
        base = jnp.clip(mm_pos - (k - w), 0, None)
        wi = (base * 2) >> 6
        r0 = rec[jnp.clip(wi, 0, nrec - 1)]
        r1 = rec[jnp.clip(wi + 1, 0, nrec - 1)]
        q0, q1, q2 = r0[..., 0], r0[..., 1], r1[..., 1]
        woff = ((base * 2) & 63).astype(jnp.uint64)
        m2k = U64((1 << (2 * k)) - 1)
        acc = jnp.int64(0)
        for cand_off in (offset, rc_offset):
            km_pos = mm_pos - cand_off
            km_pos_c = jnp.clip(km_pos, 0, max(last_km, 0))
            dbit = woff + (2 * jnp.clip(km_pos_c - base, 0, None)).astype(jnp.uint64)
            s1_ = dbit >= 64
            r = (dbit & U64(63)).astype(jnp.uint64)
            lo_w = jnp.where(s1_, q1, q0)
            hi_w = jnp.where(s1_, q2, q1)
            hi = jnp.where(r == 0, jnp.zeros_like(hi_w), hi_w << ((U64(64) - r) & U64(63)))
            kw = ((lo_w >> r) | hi) & m2k
            mt = word_equivalency(fw, rc, kw, k)
            f2 = jnp.where(km_pos_c >= (wi + 1) * 32, r1[..., 2], r0[..., 2])
            ustart = (f2 & U64((1 << 40) - 1)).astype(jnp.int64)
            ulen = (f2 >> U64(40)).astype(jnp.int64)
            ok = (km_pos_c >= ustart) & (km_pos_c + k <= ustart + ulen)
            acc = acc + mt.astype(jnp.int64).sum() + ok.astype(jnp.int64).sum()
        return acc

    def s4(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        ps, pe = bounds(dd, hc)
        win = _pos_window(dd, ps, plim, jnp)
        return one_iter(dd, fw, rc, offset, ps, pe, win, 0) + pe.sum()

    def s5(dd, fw):
        r = sshash_k2u(dd, fw, jnp, mode="main", probe_limit=plim)
        return (
            r["unitig_id"].sum()
            + r["pos"].sum()
            + r["mt"].astype(jnp.int64).sum()
            + r["use_skew"].astype(jnp.int64).sum()
            + r["unresolved"].astype(jnp.int64).sum()
        )

    def a0(dd, fw):
        # extraction-ALU control: identical candidate math, data from
        # ROLLS of fw (register/local, no random gathers). Prices the
        # u64-emulation VPU cost of plim iterations.
        fw, rc, offset, hc = prep(dd, fw)
        rc_offset = k - offset - w
        m2k = U64((1 << (2 * k)) - 1)
        acc = jnp.int64(0)
        for j in range(plim):
            mm_pos = (jnp.roll(fw, j + 1) & U64((1 << 30) - 1)).astype(jnp.int64)
            base = jnp.clip(mm_pos - (k - w), 0, None)
            wi = (base * 2) >> 6
            q0 = jnp.roll(fw, j + 2)
            q1 = jnp.roll(fw, j + 3)
            q2 = jnp.roll(fw, j + 4)
            r2_ = jnp.roll(fw, j + 5)
            r3_ = jnp.roll(fw, j + 6)
            woff = ((base * 2) & 63).astype(jnp.uint64)
            for cand_off in (offset, rc_offset):
                km_pos = mm_pos - cand_off
                km_pos_c = jnp.clip(km_pos, 0, 1 << 30)
                dbit = woff + (2 * jnp.clip(km_pos_c - base, 0, None)).astype(jnp.uint64)
                s1_ = dbit >= 64
                r = (dbit & U64(63)).astype(jnp.uint64)
                lo_w = jnp.where(s1_, q1, q0)
                hi_w = jnp.where(s1_, q2, q1)
                hi = jnp.where(
                    r == 0, jnp.zeros_like(hi_w), hi_w << ((U64(64) - r) & U64(63))
                )
                kw = ((lo_w >> r) | hi) & m2k
                mt = word_equivalency(fw, rc, kw, k)
                f2 = jnp.where(km_pos_c >= (wi + 1) * 32, r3_, r2_)
                ustart = (f2 & U64((1 << 40) - 1)).astype(jnp.int64)
                ulen = (f2 >> U64(40)).astype(jnp.int64)
                ok = (km_pos_c >= ustart) & (km_pos_c + k <= ustart + ulen)
                acc = acc + mt.astype(jnp.int64).sum() + ok.astype(jnp.int64).sum()
        return acc

    # ---- round-5 bpos-mode stages (the committed 8.1M layout) ----
    def s1b(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        brow = dd["bpos"][hc]
        return brow.astype(jnp.int64).sum(-1).sum() + offset.sum()

    def s3b(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        brow = dd["bpos"][hc]
        rec = dd["us"]["useqrec"]
        nrec = rec.shape[0]
        acc = brow[..., 3].astype(jnp.int64).sum()
        for j in range(plim):
            mm_pos = brow[..., j].astype(jnp.int64)
            base = jnp.clip(mm_pos - (k - w), 0, None)
            wi = (base * 2) >> 6
            r0 = rec[jnp.clip(wi, 0, nrec - 1)]
            acc = acc + r0.astype(jnp.int64).sum(-1).sum()
        return acc

    def one_iter_b(dd, fw, rc, offset, mm_pos):
        rec = dd["us"]["useqrec"]
        nrec = rec.shape[0]
        last_km = int(host["us"]["meta"].total_len - k)
        rc_offset = k - offset - w
        base = jnp.clip(mm_pos - (k - w), 0, None)
        wi = (base * 2) >> 6
        r0 = rec[jnp.clip(wi, 0, nrec - 1)]
        q0, q1, q2 = r0[..., 0], r0[..., 1], r0[..., 2]
        f2 = r0[..., 3]
        ustart = (f2 & U64((1 << 40) - 1)).astype(jnp.int64)
        ulen = (f2 >> U64(40)).astype(jnp.int64)
        woff = ((base * 2) & 63).astype(jnp.uint64)
        m2k = U64((1 << (2 * k)) - 1)
        acc = jnp.int64(0)
        for cand_off in (offset, rc_offset):
            km_pos = mm_pos - cand_off
            km_pos_c = jnp.clip(km_pos, 0, max(last_km, 0))
            dbit = woff + (2 * jnp.clip(km_pos_c - base, 0, None)).astype(jnp.uint64)
            s1_ = dbit >= 64
            r = (dbit & U64(63)).astype(jnp.uint64)
            lo_w = jnp.where(s1_, q1, q0)
            hi_w = jnp.where(s1_, q2, q1)
            hi = jnp.where(r == 0, jnp.zeros_like(hi_w), hi_w << ((U64(64) - r) & U64(63)))
            kw = ((lo_w >> r) | hi) & m2k
            mt = word_equivalency(fw, rc, kw, k)
            ok = (km_pos_c >= ustart) & (km_pos_c + k <= ustart + ulen)
            acc = acc + mt.astype(jnp.int64).sum() + ok.astype(jnp.int64).sum()
        return acc

    def s4b(dd, fw):
        fw, rc, offset, hc = prep(dd, fw)
        brow = dd["bpos"][hc]
        return one_iter_b(
            dd, fw, rc, offset, brow[..., 0].astype(jnp.int64)
        ) + brow[..., 3].astype(jnp.int64).sum()

    from mazu_tpu.ops.compact import flagged_lanes

    def s6(dd, fw):
        r = sshash_k2u(dd, fw, jnp, mode="main", probe_limit=plim)
        ovf = r["use_skew"] | r["unresolved"] | (r.get("occ_cnt", jnp.zeros_like(r["pos"])) > 2)
        lanes, n_ovf = flagged_lanes(ovf, max(8192, B // 8), jnp)
        return r["unitig_id"].sum() + r["pos"].sum() + lanes.sum() + n_ovf

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery

    from mazu_tpu.pytree import meta as make_meta

    darr = {
        "k2u": host,
        "u2pos": u2pos.device_arrays(),
        "refs": index.refs.device_arrays(),
        "meta": make_meta(k=index.k, index_type=index.index_type),
    }
    darr["refs"].pop("seq", None)
    d_full = jax.device_put(darr)
    mo = max(1, index.max_occs())
    plim2 = int(os.environ.get("MAZU_GBP_PLIM2", plim + 2))

    def s7(dd_full, fw):
        o = get_ref_pos_compact(
            dd_full, fw, jnp, mo, merge=False, probe_limit=plim,
            m2=max(8192, B // 8), m2b=max(8192, B // 8),
            defer_valid=True, probe_limit2=plim2,
        )
        return OneGraphIndexQuery.checksum(o, jnp)

    def timeit_full(tag, fn, iters=5):
        def run(dd, work):
            def step(c, i):
                return c + fn(dd, jnp.roll(work, i * jnp.int64(40009))), 0

            t, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
            return t

        f = jax.jit(run)
        jax.device_get(f(d_full, d_kms))
        t0 = time.time()
        for _ in range(iters):
            o = f(d_full, d_kms)
        jax.device_get(o)
        dt = (time.time() - t0) / iters / CH
        log(f"[{tag:30s}] {dt*1e3:8.2f} ms/1M")

    if use_bpos:
        stages = [
            ("S0 minhash+hc", s0),
            ("S1b +bpos row", s1b),
            ("S3b +usrec rows", s3b),
            ("S4b +1 full iteration", s4b),
            ("S5 full main", s5),
            ("S6 +compaction only", s6),
            ("A0 ALU control (no gathers)", a0),
        ]
    else:
        stages = [
            ("S0 minhash+hc", s0),
            ("S1 +bounds", s1),
            ("S2 +pos window", s2),
            ("S3 +row gathers only", s3),
            ("S4 +1 full iteration", s4),
            ("S5 full main", s5),
            ("S6 +compaction only", s6),
            ("A0 ALU control (no gathers)", a0),
        ]
    for tag, fn in stages:
        try:
            timeit(tag, fn)
        except Exception as e:  # noqa: BLE001
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")
    try:
        timeit_full("S7 full query (p2x%d)" % plim2, s7)
    except Exception as e:  # noqa: BLE001
        log(f"[S7] FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
