"""Round-2 TPU session: Gbp-scale COMPACT-engine proof on one chip.

The capacity ladder's "human genome fits one chip" row for the ~9
bits/k-mer engines was an extrapolation; this measures it. 1Gbp random
synthetic (997M k-mers, 100K x 10kb unitigs), SSHash engine="fast32"
(BooPHF32 MPHF + flat32 bucket prefix — the reference-compact layout,
space first), full query (k2u + occurrence projection) on the chip with
exact ground-truth validation of a uniform 1M-query sample (fw+rc mixed).

Run: timeout 5400 python tpu_gbp_r2.py  (build is host-side, ~20-40 min)
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

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    import bench
    from mazu_tpu.index.modindex import ModIndex, get_ref_pos_padded
    from mazu_tpu.kmer import revcomp
    from mazu_tpu.kphf.sshash import SSHash
    from mazu_tpu.pytree import tree_bytes

    NB = int(os.environ.get("MAZU_GBP_BASES", 1_000_000_000))
    PIECE = 10_000
    k = 31
    t0 = time.time()
    unitigs, refs, u2pos = bench.build_synthetic(NB)
    log(f"synth {NB/1e9:.2f}Gbp in {time.time()-t0:.0f}s: {unitigs.n_kmers} kmers")
    t0 = time.time()
    skew = int(os.environ.get("MAZU_GBP_SKEW", 4))
    k2u = SSHash.from_unitig_set(unitigs, w=15, skew_param=skew, engine="fast32")
    log(
        f"fast32 build {time.time()-t0:.0f}s: bits/kmer="
        f"{k2u.num_bits()/k2u.n_kmers:.2f} skew_kmers={k2u.n_kmers_in_skew_index}"
    )
    index = ModIndex(k2u, u2pos, refs)
    t0 = time.time()
    # COMPACT device layout: packed IntVector positions + flat32 prefix
    # (the default inline rows are the 40B/occurrence SPEED layout — 8GB+
    # at 1Gbp; packed is the space point of the capacity ladder)
    host_arrays = {
        "k2u": k2u.device_arrays(
            prefix_kind=os.environ.get("MAZU_GBP_PREFIX", "flat32"),
            pos_kind=os.environ.get("MAZU_GBP_POS", "packed"),
        ),
        "u2pos": u2pos.device_arrays(),
        "refs": refs.device_arrays(),
        "meta": index.device_arrays()["meta"],
    }
    # the refs SeqVector (250MB at 1Gbp) is only for workload sampling --
    # keep it host-side, the index does not need it on device
    seq_words = host_arrays["refs"].pop("seq", None)
    log(
        f"host arrays {time.time()-t0:.0f}s, device footprint "
        f"{tree_bytes(host_arrays)/1e9:.2f} GB"
    )
    t0 = time.time()
    arrays = jax.device_put(host_arrays)
    jax.block_until_ready(arrays)
    log(f"device placement {time.time()-t0:.0f}s")

    # uniform 1M-query sample with ground truth
    B = 1 << 20
    rng = np.random.default_rng(0)
    upos = rng.integers(0, PIECE - k + 1, B)
    uid = rng.integers(0, unitigs.n_unitigs, B)
    gpos = uid * PIECE + upos
    kms = unitigs.useq.get_kmer_u64(gpos, k)
    flip = rng.random(B) < 0.5
    kms[flip] = revcomp(kms[flip], k)

    @jax.jit
    def q(arrays, kms):
        out = get_ref_pos_padded(arrays, kms, jnp, 1)
        chk = out["ref_pos"].sum() + out["unitig_id"].sum()
        return out, chk

    d_kms = jax.device_put(jnp.asarray(kms))
    t0 = time.time()
    out, chk = q(arrays, d_kms)
    chk = int(jax.device_get(chk))
    log(f"compile+first {time.time()-t0:.0f}s")
    # exact ground truth: every sampled k-mer maps to its (uid, upos);
    # orientation-adjusted pos equals upos for Identity, reference math
    ouid = np.asarray(out["unitig_id"])
    opos = np.asarray(out["pos"])
    omt = np.asarray(out["mt"])
    orp = np.asarray(out["ref_pos"])[:, 0]
    assert (omt > 0).all(), f"misses: {(omt == 0).sum()}"
    np.testing.assert_array_equal(ouid, uid)
    np.testing.assert_array_equal(opos, upos)
    np.testing.assert_array_equal(orp, upos)  # ref == unitig in this synth
    # foreign probes must miss
    fout, _ = q(arrays, jnp.full(1024, np.uint64(0x3FF3FF3FF3FF3FF), jnp.uint64))
    assert (np.asarray(fout["mt"]) == 0).all()
    log(f"EXACT: all {B} sampled queries (fw+rc) + foreign misses clean")

    iters = int(os.environ.get("MAZU_BENCH_ITERS", 5))
    t0 = time.time()
    for _ in range(iters):
        _, c2 = q(arrays, d_kms)
        assert int(jax.device_get(c2)) == chk
    dt = time.time() - t0
    log(f"{iters} x {B} full queries in {dt:.2f}s -> {B*iters/dt/1e6:.2f}M q/s")
    del seq_words


if __name__ == "__main__":
    main()
