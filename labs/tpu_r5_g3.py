"""Round-5 TPU session 2: 3Gbp one-chip measurements, one process.

Stage A (VERDICT r4 #3): the fast32 LEAN ckpt with mrows (paired
word|global-rank MPHF rows, kphf/boophf32.py) — the r3 attribution
priced the full BooPHF chain at 121-355 ms/1M-chunk and mrows turns a
truncated lookup into ``mlim`` gather ops with no rank tail. Target
>=2.5M q/s (from 1.60M).

Stage B (VERDICT r4 #4): the direct engine at 3Gbp on ONE chip. The r4
attempt (load=0.5, T=2^29) was over HBM and tripped the axon
x64-rewrite compiler bug on the 2^29-entry u16 gdelta gather; at
bucket_load=2.0 T=2^27 the whole lean layout is ~6GB and gdelta has
2^27 entries (the 1Gbp ckpt queries the same shape fine). Deep merged
buckets want plim=3 + p2x5 (the 1Gbp occupancy-2.0 result).

Env: MAZU_R5_G3_FAST32=<ckpt>, MAZU_R5_G3_DIRECT=<ckpt>,
     MAZU_R5_G3_STAGES=fast32,fast32_mrows,direct (default all present)

Run from repo root: timeout 7200 python labs/tpu_r5_g3.py
"""

import _bootstrap  # noqa: F401

import gc
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_stage(ckpt, env):
    """Run tpu_gbp_r3.run_prefix under a temporary env overlay."""
    import tpu_gbp_r3 as g

    from mazu_tpu.io.checkpoint import load_index

    saved = {}
    for kk, v in env.items():
        saved[kk] = os.environ.get(kk)
        if v is None:
            os.environ.pop(kk, None)
        else:
            os.environ[kk] = v
    try:
        t0 = time.time()
        index = load_index(ckpt)
        k2u, u2pos, refs = index.k2u, index.u2pos, index.refs
        unitigs = k2u.unitigs
        NB = unitigs.total_len
        log(f"== {ckpt} loaded {time.time()-t0:.0f}s: {k2u.n_kmers} kmers")
        plims = [int(p) for p in os.environ.get("MAZU_GBP_PLIM", "2").split(",")]
        g.run_prefix(
            os.environ.get("MAZU_GBP_PREFIX", "grouped16"),
            index, k2u, u2pos, refs, unitigs, NB, 10_000, index.k,
            plims, uproj=True,
        )
        del index, k2u, u2pos, refs, unitigs
        gc.collect()
    finally:
        for kk, v in saved.items():
            if v is None:
                os.environ.pop(kk, None)
            else:
                os.environ[kk] = v


def main():
    cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
    import jax

    if os.environ.get("MAZU_R5_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    stages = os.environ.get("MAZU_R5_G3_STAGES", "").split(",")
    ck_f = os.environ.get("MAZU_R5_G3_FAST32")
    ck_d = os.environ.get("MAZU_R5_G3_DIRECT")
    if not stages or stages == [""]:
        stages = []
        if ck_f:
            stages += ["fast32_mrows", "fast32"]
        if ck_d:
            stages += ["direct"]

    for st in stages:
        log(f"#### stage {st} ####")
        try:
            if st == "fast32":
                # r4 baseline config: LEAN + truncated MPHF (mlim=4)
                run_stage(ck_f, {
                    "MAZU_GBP_LEAN": "1", "MAZU_GBP_DEFER": "1",
                    "MAZU_GBP_MLIM": "4", "MAZU_GBP_PLIM": "2",
                    "MAZU_GBP_MROWS": None, "MAZU_GBP_ITERS": "3",
                    "MAZU_GBP_BATCH": str(1 << 19),  # same B as mrows
                })
            elif st == "fast32_mrows":
                # B=512K: the 6.54 GB mrows footprint leaves ~1.5 GB of
                # graph workspace and the 1M-lane OneGraph needs ~2 GB
                # (RESOURCE_EXHAUSTED measured); the batch-size curve is
                # flat at <=1M lanes (STATUS r2: 512K x CH=512 == 1M)
                run_stage(ck_f, {
                    "MAZU_GBP_LEAN": "1", "MAZU_GBP_DEFER": "1",
                    "MAZU_GBP_MLIM": "4", "MAZU_GBP_PLIM": "2",
                    "MAZU_GBP_MROWS": "1", "MAZU_GBP_ITERS": "3",
                    "MAZU_GBP_BATCH": str(1 << 19),
                })
            elif st == "direct":
                # LEAN is mandatory at 3Gbp: the paired words2/wb2 copies
                # are ~2.25 GB and the fast32 run proved the query graph
                # needs ~1.5-2 GB of workspace headroom (STATUS r4 —
                # 7.72 GB paired placed but RESOURCE_EXHAUSTED at query)
                run_stage(ck_d, {
                    "MAZU_GBP_LEAN": "1",
                    "MAZU_GBP_PLIM": "3", "MAZU_GBP_PLIM2": "5",
                    "MAZU_GBP_DEFER": "1", "MAZU_GBP_ITERS": "3",
                    "MAZU_GBP_MROWS": None,
                })
            else:
                log(f"unknown stage {st}")
        except Exception as e:  # noqa: BLE001 — later stages still run
            log(f"stage {st} FAILED: {type(e).__name__}: {e}")
            # the traceback holds run_prefix's frame -> the device-array
            # pytree stays referenced and the NEXT stage's placement
            # RESOURCE_EXHAUSTs (measured: stage 2 OOM'd at 6.22 GB right
            # after a stage-1 OOM left 6.54 GB live on device)
            import traceback

            traceback.clear_frames(e.__traceback__)
            del e
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
