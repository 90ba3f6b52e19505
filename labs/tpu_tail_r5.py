"""Round-5 capacity-tier TAIL attribution + sweep (VERDICT r4 weak #5).

tpu_usrec_attr.py (MAZU_GBP_BPOS=1, 300Mbp, plim=2) pinned the main
phase at 73.8 ms/1M — EXACTLY the gather model (bpos 12 ns + 2 usrec
rows ~33 ns; ALU 1 ms; compaction +1.8 ms) — so the 123 ns/q full-query
gap lives in the type-split phase 2. This lab times the tail pieces in
isolation on REAL compacted overflow lanes, then sweeps full-query
configs:

  T1 middle-phase kernel  (sshash main plim2-deep on m_b lanes + wide proj)
  T2 padded residue       (get_ref_pos_padded on m_c lanes)
  T3 flagged_lanes2       (2-channel MXU rank on B)
  T4 type-A wide proj     (on m_a lanes)
  full-query sweep        plim2 in {None,3,4,6} x m2c {default,tight}

POST-MORTEM (round 5): this sweep's p2x3 "8.96M" was INVALID — the
default m_c (m_b//8 = 12.4K) silently truncated the 22.1K-lane residue
at p2=3; OneGraphIndexQuery now raises on that (over_budget_c channel)
and the honest p2x3 number is 6.86M (labs/tpu_r5_session.py), so p2x4
remains the committed 300Mbp default.

Run: MAZU_GBP_CKPT=.ckpts/bench_capacity_300m.npz python labs/tpu_tail_r5.py
"""

import _bootstrap  # noqa: F401

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import (
        build_useqrec,
        get_ref_pos_compact,
        get_ref_pos_padded,
    )
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.index.modindex import _occ_projection_wide
    from mazu_tpu.io.checkpoint import load_index
    from mazu_tpu.kmer import revcomp
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.ops.compact import flagged_lanes2
    from mazu_tpu.pytree import meta as make_meta, tree_bytes

    ck = os.environ["MAZU_GBP_CKPT"]
    prefix_kind = os.environ.get("MAZU_GBP_PREFIX", "grouped16")
    plim = int(os.environ.get("MAZU_GBP_PLIM", 2))
    CH = int(os.environ.get("MAZU_GBP_CH", 8))
    B = 1 << 20

    t0 = time.time()
    index = load_index(ck)
    k2u, u2pos = index.k2u, index.u2pos
    unitigs = k2u.unitigs
    log(f"loaded {ck} {time.time()-t0:.0f}s")
    host = k2u.device_arrays(
        prefix_kind=prefix_kind, pos_kind="packed", bucket_inline=True
    )
    host["us"]["useqrec"] = build_useqrec(u2pos, unitigs)
    darr = {
        "k2u": host,
        "u2pos": u2pos.device_arrays(),
        "refs": index.refs.device_arrays(),
        "meta": make_meta(k=index.k, index_type=index.index_type),
    }
    darr["refs"].pop("seq", None)
    d = jax.device_put(darr)
    log(f"device {tree_bytes(darr)/1e9:.2f} GB")

    m = host["meta"]
    k = m.k
    mo = max(1, index.max_occs())
    rng = np.random.default_rng(0)
    PIECE = 10_000
    upos = rng.integers(0, PIECE - k + 1, B)
    uid = rng.integers(0, unitigs.n_unitigs, B)
    kms = unitigs.useq.get_kmer_u64(uid * PIECE + upos, k)
    flip = rng.random(B) < 0.5
    kms[flip] = revcomp(kms[flip], k)
    d_kms = jax.device_put(jnp.asarray(kms))

    # ---- host oracle: find the REAL overflow lanes at this plim
    t0 = time.time()
    r_host = sshash_k2u(host, kms, np, mode="main", probe_limit=plim)
    ovf = np.asarray(
        r_host["use_skew"]
        | r_host["unresolved"]
        | (np.asarray(r_host["occ_cnt"]) > 2)
    )
    type_b = np.asarray(r_host["use_skew"] | r_host["unresolved"])
    n_b = int(type_b.sum())
    n_a = int((ovf & ~type_b).sum())
    log(
        f"host main {time.time()-t0:.0f}s: overflow {ovf.sum()} "
        f"(A={n_a}, B={n_b}) of {B}"
    )
    fit = lambda c: max(1024, -(-(int(c) + 256) // 1024) * 1024)  # noqa: E731
    m_a, m_b = fit(n_a * 1.3), fit(n_b * 1.15)

    # middle-phase residue size at plim2=4 (host)
    fwB_host = kms[np.flatnonzero(type_b)]
    rM_host = sshash_k2u(host, fwB_host, np, mode="main", probe_limit=4)
    n_c = int(np.asarray(rM_host["use_skew"] | rM_host["unresolved"]).sum())
    log(f"middle residue at p2x4: {n_c} of {n_b}")
    pad_b = np.zeros(m_b, dtype=np.uint64)
    pad_b[: len(fwB_host)] = fwB_host
    d_fwB = jax.device_put(jnp.asarray(pad_b))
    m_c_def = max(64, m_b // 8)
    m_c_tight = fit(n_c * 1.3)
    pad_c = np.zeros(m_c_def, dtype=np.uint64)
    residx = np.flatnonzero(
        np.asarray(rM_host["use_skew"] | rM_host["unresolved"])
    )[:m_c_def]
    pad_c[: len(residx)] = fwB_host[residx]
    d_fwC = jax.device_put(jnp.asarray(pad_c))

    def timeit(tag, f, *args, iters=5):
        jf = jax.jit(f)
        jax.device_get(jf(*args))
        t0 = time.time()
        for _ in range(iters):
            o = jf(*args)
        jax.device_get(o)
        dt = (time.time() - t0) / iters
        log(f"[{tag:34s}] {dt*1e3:8.2f} ms")
        return dt

    # T1: middle-phase kernel on the m_b compacted lanes
    def t1(dd, fwB):
        rM = sshash_k2u(dd["k2u"], fwB, jnp, mode="main", probe_limit=4)
        pw = _occ_projection_wide(dd, rM, jnp, mo)
        return rM["pos"].sum() + pw["ref_pos"].sum() + rM["unresolved"].sum()

    # T2: padded residue
    def t2(dd, fwC):
        o = get_ref_pos_padded(dd, fwC, jnp, mo)
        return o["pos"].sum() + o["ref_pos"].sum()

    # T3: flagged_lanes2 on B
    def t3(dd, fw):
        r = sshash_k2u(dd["k2u"], fw, jnp, mode="main", probe_limit=plim)
        tb = r["use_skew"] | r["unresolved"]
        ta = (r["occ_cnt"] > 2) & ~tb
        la, na, lb, nb = flagged_lanes2(ta, tb, m_a, m_b, jnp)
        return la.sum() + lb.sum() + na + nb

    timeit("T1 middle kernel (m_b=%d)" % m_b, t1, d, d_fwB)
    timeit("T2 padded residue (m_c=%d)" % m_c_def, t2, d, d_fwC)
    timeit("T3 main+flagged_lanes2", t3, d, d_kms)

    # ---- full-query sweep
    host_out = get_ref_pos_compact(
        host if False else darr, kms, np, mo, merge=False, probe_limit=plim,
        m2=m_a, m2b=m_b, probe_limit2=4,
    )
    chk0 = int(OneGraphIndexQuery.checksum(host_out, np))
    log(f"host full-query checksum {chk0}")

    def sweep(tag, plim2, m2c):
        og = OneGraphIndexQuery(
            index, B, n_chunks=CH, m2=m_a, m2b=m_b, probe_limit=plim,
            host_arrays=darr, probe_limit2=plim2, m2c=m2c,
        )
        t0 = time.time()
        tot, worst = og.checksum_pass_rolled(d_kms)
        log(f"  compile+first {time.time()-t0:.0f}s worst={worst}")
        if plim2 == 4 and m2c is None:
            assert tot == CH * chk0, (tot, CH, chk0)
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            tot2, _ = og.checksum_pass_rolled(d_kms)
            assert tot2 == tot
        qps = B * CH * iters / (time.time() - t0)
        log(f"[sweep {tag:24s}] {qps/1e6:6.2f}M q/s")

    sweep("p2x4 (bench r4 cfg)", 4, None)
    sweep("p2x4 m2c tight=%d" % m_c_tight, 4, m_c_tight)
    sweep("p2x6", 6, None)
    sweep("p2x3", 3, None)
    sweep("no middle (padded 2b)", None, None)


if __name__ == "__main__":
    main()
