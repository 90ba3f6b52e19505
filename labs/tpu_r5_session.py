"""Round-5 TPU session 1: capacity-tier skew/p2 sweep (300Mbp) + 1Gbp
plim/p2 sweep — one process (the remote-compile service stalls
multi-minute at random per process; batch everything).

The tail lab (tpu_tail_r5.py) attributed the 300Mbp capacity gap to the
type-split tail: middle 35ms + padded residue 27.5ms + rank 13ms against
a 73.8ms main phase. The padded residue probes to probe_bound =
min(skew_param, max bucket depth) — 64 on the r4 ckpts — so residue
lanes pay ~64 window probes each. A skew=8/16 BUILD bounds that at 8/16
and routes heavier buckets through the 2-gather cuckoo skew table
instead (reference analog: skew_param, src/kphf/sshash.rs:43-51 — the
reference leaves the parameter to the caller and its own CLI defaults
to 64, src/bin/index/main.rs:9).

Env:
  MAZU_R5_300=<ckpt[,ckpt...]>   300Mbp ckpts to sweep (bpos+useqrec)
  MAZU_R5_300_SWEEP=plim:p2[:tight][,...]   default "2:3,2:4,2:8,1:3"
  MAZU_R5_1G=<ckpt>              1Gbp ckpt (bpos+useqrec)
  MAZU_R5_1G_SWEEP=...           default "3:4,3:5,2:3"
  MAZU_R5_CH (8), MAZU_R5_ITERS (3)

Run from repo root: timeout 5400 python labs/tpu_r5_session.py
"""

import _bootstrap  # noqa: F401

import gc
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_sweep(s):
    out = []
    for part in s.split(","):
        bits = part.split(":")
        plim = int(bits[0])
        p2 = int(bits[1]) if len(bits) > 1 and bits[1] else None
        tight = len(bits) > 2 and bits[2] == "tight"
        out.append((plim, p2, tight))
    return out


def sweep_ckpt(ck, sweeps, CH, iters, bpos=True):
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import build_useqrec, get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.io.checkpoint import load_index
    from mazu_tpu.kmer import revcomp
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.pytree import meta as make_meta, tree_bytes

    B = 1 << 20
    t0 = time.time()
    index = load_index(ck)
    k2u, u2pos = index.k2u, index.u2pos
    unitigs = k2u.unitigs
    nb = int(unitigs.total_len)
    log(f"== {ck}: loaded {time.time()-t0:.0f}s, {k2u.n_kmers} kmers, "
        f"{nb/1e6:.0f}Mbp, probe_bound={k2u.skew_param}")
    host = {
        "k2u": k2u.device_arrays(
            prefix_kind="grouped16", pos_kind="packed", bucket_inline=bpos
        ),
        "u2pos": u2pos.device_arrays(),
        "refs": index.refs.device_arrays(),
        "meta": make_meta(k=index.k, index_type=index.index_type),
    }
    host["refs"].pop("seq", None)
    host["k2u"]["us"]["useqrec"] = build_useqrec(u2pos, unitigs)
    if nb >= (1 << 29) and "words2" in host["k2u"]["us"]["useq"]:
        # Gbp HBM fit: words2 (paired) serves every query-path read; the
        # flat words copy is only the fallback branch (~0.25 GB/Gbp —
        # the r4 5.94 GB 1Gbp config dropped it; with it the 1Gbp query
        # graph RESOURCE_EXHAUSTs at 6.19 GB of arrays)
        host["k2u"]["us"]["useq"].pop("words")
    log(f"device footprint {tree_bytes(host)/1e9:.2f} GB")
    arrays = jax.device_put(host)
    jax.block_until_ready(arrays)

    PIECE = 10_000
    k = index.k
    rng = np.random.default_rng(0)
    upos = rng.integers(0, PIECE - k + 1, B)
    uid = rng.integers(0, unitigs.n_unitigs, B)
    kms = unitigs.useq.get_kmer_u64(uid * PIECE + upos, k)
    flip = rng.random(B) < 0.5
    kms[flip] = revcomp(kms[flip], k)
    d_kms = jax.device_put(jnp.asarray(kms))
    mo = max(1, index.max_occs())
    fit = lambda c: max(1024, -(-(int(c) + 256) // 1024) * 1024)  # noqa: E731

    # overflow counts per plim (device, cheap) — sizes the compacted
    # blocks. probe_limit unrolls the probe loop, so it must be STATIC.
    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def counts(arrays, kms, plim):
        r = sshash_k2u(arrays["k2u"], kms, jnp, mode="main", probe_limit=plim)
        tb = r["use_skew"] | r["unresolved"]
        ta = (r["occ_cnt"] > 2) & ~tb
        return ta.sum(), tb.sum()

    @partial(jax.jit, static_argnums=(2,))
    def residue(arrays, kms, p2):
        r = sshash_k2u(arrays["k2u"], kms, jnp, mode="main", probe_limit=p2)
        return (r["use_skew"] | r["unresolved"]).sum()

    szs = {}
    for plim, p2, tight in sweeps:
        if plim not in szs:
            na, nbv = (int(x) for x in jax.device_get(counts(arrays, d_kms, plim)))
            szs[plim] = (fit(na * 1.3), fit(nbv * 1.15))
            log(f"  plim={plim}: type-A {na}, type-B {nbv}")
        if p2 and (plim, p2) not in szs:
            # residue capacity always sized from the measured count (the
            # m_b//8 default under-fits shallow-p2 configs); "tight" only
            # drops the extra slack
            nc = int(jax.device_get(residue(arrays, d_kms, p2)))
            m_b = szs[plim][1]
            szs[(plim, p2)] = (
                fit(nc * 1.3) if tight else max(fit(nc * 1.3), m_b // 8)
            )
            log(f"  residue at p2={p2}: {nc}")

    # host oracle once (checksum ground truth at the first sweep config)
    plim0, p20, t0_ = sweeps[0]
    m_a0, m_b0 = szs[plim0]
    t0 = time.time()
    host_out = get_ref_pos_compact(
        host, kms, np, mo, merge=False, probe_limit=plim0,
        m2=m_a0, m2b=m_b0, probe_limit2=p20,
        m2c=szs.get((plim0, p20)),
    )
    chk0 = int(OneGraphIndexQuery.checksum(host_out, np))
    assert not bool(host_out["over_budget"])
    # exactness: merge phases, compare to sampled ground truth
    muid = np.asarray(host_out["main"]["unitig_id"]).copy()
    mpos = np.asarray(host_out["main"]["pos"]).copy()
    mmt = np.asarray(host_out["main"]["mt"]).copy()
    for pk, lk, sk in (
        ("phase2", "lanes", "slot_real"),
        ("phase2b", "lanes_b", "slot_real_b"),
    ):
        real = np.asarray(host_out[sk])
        lanes = np.asarray(host_out[lk])[real]
        muid[lanes] = np.asarray(host_out[pk]["unitig_id"])[real]
        mpos[lanes] = np.asarray(host_out[pk]["pos"])[real]
        mmt[lanes] = np.asarray(host_out[pk]["mt"])[real]
    assert (mmt > 0).all()
    np.testing.assert_array_equal(muid, uid)
    np.testing.assert_array_equal(mpos, upos)
    log(f"  host oracle {time.time()-t0:.0f}s chk={chk0} EXACT")

    best = (0.0, None)
    for plim, p2, tight in sweeps:
        m_a, m_b = szs[plim]
        m_c = szs.get((plim, p2))
        tag = f"plim{plim}_p2x{p2 or 0}{'_tight' if tight else ''}"
        og = OneGraphIndexQuery(
            index, B, n_chunks=CH, m2=m_a, m2b=m_b, probe_limit=plim,
            host_arrays=host, probe_limit2=p2, m2c=m_c,
        )
        t0 = time.time()
        tot, worst = og.checksum_pass_rolled(d_kms)
        log(f"  [{tag}] compile+first {time.time()-t0:.0f}s worst={worst}")
        if (plim, p2, tight) == sweeps[0]:
            assert tot == CH * chk0, (tot, CH, chk0)
        t0 = time.time()
        for _ in range(iters):
            tot2, _ = og.checksum_pass_rolled(d_kms)
            assert tot2 == tot
        qps = B * CH * iters / (time.time() - t0)
        log(f"  [{tag}] {qps/1e6:6.2f}M q/s")
        print(
            f'{{"metric": "r5_capacity_{nb//1000000}Mbp_'
            f'{os.path.basename(ck).replace(".npz", "")}_{tag}", '
            f'"value": {qps:.0f}, "unit": "queries/s", '
            f'"vs_baseline": {qps/1e9:.6f}}}', flush=True,
        )
        if qps > best[0]:
            best = (qps, tag)
        del og
        gc.collect()
    log(f"== {ck} best: {best[1]} at {best[0]/1e6:.2f}M q/s")
    del arrays, host, index
    gc.collect()
    return best


def main():
    cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    import jax

    if os.environ.get("MAZU_R5_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    CH = int(os.environ.get("MAZU_R5_CH", 8))
    iters = int(os.environ.get("MAZU_R5_ITERS", 3))
    for ck in [c for c in os.environ.get("MAZU_R5_300", "").split(",") if c]:
        sweeps = parse_sweep(os.environ.get("MAZU_R5_300_SWEEP", "2:3,2:4,2:8,1:3"))
        sweep_ckpt(ck, sweeps, CH, iters)
    ck1g = os.environ.get("MAZU_R5_1G")
    if ck1g:
        sweeps = parse_sweep(os.environ.get("MAZU_R5_1G_SWEEP", "3:4,3:5,2:3"))
        sweep_ckpt(ck1g, sweeps, CH, iters)


if __name__ == "__main__":
    main()
