"""Round-2 TPU session #5: per-stage attribution of the 1graph chunk cost
on the real chr01 index (CH=8 scanned chunks of 1M, same structure as the
bench pass, timed after warmup):

  A  minimizer + bucket hash                 (compute only)
  B  A + flat2 bucket-bounds pair gather     (+1 random 8B-pair gather)
  C  main k2u probe, plim=2                  (A+B+ row0/row1 gathers)
  D  C + fused projection                    (zero extra gathers)
  E  D + hierarchical lane compaction M2     (the new select)
  F  full compact pass (real thing)          (E + phase-2 + checksum)

Then CH/batch scaling probes through bench.main().
Run: timeout 3000 python tpu_stageattr_r2.py > /tmp/tpu_stageattr_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import os
import sys
import time

import numpy as np

import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.twophase import _project_fused
    from mazu_tpu.kmer import canonical_minimizer_batch, revcomp
    from mazu_tpu.kphf.boophf32 import fold_hash32
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.ops.compact import flagged_lanes

    os.environ.setdefault("MAZU_BENCH_SKEW", "4")
    index = bench.build_index()
    k = index.k
    arrays_host = index.device_arrays(fused=True, pos_kind="inline2")
    arrays = jax.device_put(arrays_host)
    m = arrays_host["k2u"]["meta"]
    mo = max(1, index.max_occs())
    M2, plim, CH, N = 32256, 2, 8, 1 << 20

    kms_parts = [index.refs.ref_kmers(ri, k) for ri in range(min(index.n_refs, 128))]
    kms = np.concatenate(kms_parts)
    rng = np.random.default_rng(0)
    flip = rng.random(len(kms)) < 0.5
    kms[flip] = revcomp(kms[flip], k)
    work = np.tile(kms, -(-N // len(kms)))[:N]
    stack = np.stack(
        [rng.permutation(work) for _ in range(CH)]
    )
    d_stack = jax.device_put(jnp.asarray(stack))

    def timeit(tag, fn, iters=5):
        f = jax.jit(fn)
        o = jax.device_get(f(arrays, d_stack))  # compile + warm
        t0 = time.time()
        for _ in range(iters):
            o = f(arrays, d_stack)
        jax.device_get(o)
        dt = (time.time() - t0) / iters / CH
        log(f"[{tag:28s}] {dt*1e3:7.2f} ms/1M chunk")
        return dt

    def scan_over(chunk_fn):
        def run(arrays, stack):
            def step(carry, chunk):
                return carry + chunk_fn(arrays, chunk), 0
            tot, _ = jax.lax.scan(step, jnp.int64(0), stack)
            return tot
        return run

    def stage_a(arrays, fw):
        d = arrays["k2u"]
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, m.k, m.w, m.seed, hash32=m.hash32
        )
        hc = (fold_hash32(mm) & np.uint32(m.direct_t - 1)).astype(jnp.int64)
        return hc.sum() + offset.astype(jnp.int64).sum()

    def stage_b(arrays, fw):
        d = arrays["k2u"]
        mm, offset, _, _ = canonical_minimizer_batch(
            jnp, fw, m.k, m.w, m.seed, hash32=m.hash32
        )
        hc = (fold_hash32(mm) & np.uint32(m.direct_t - 1)).astype(jnp.int64)
        pair = d["prefix"]["flat2"][hc]
        return (
            pair[..., 0].astype(jnp.int64).sum()
            + pair[..., 1].astype(jnp.int64).sum()
            + offset.astype(jnp.int64).sum()
        )

    def stage_c(arrays, fw):
        r = sshash_k2u(arrays["k2u"], fw, jnp, mode="main", probe_limit=plim)
        return (
            r["unitig_id"].sum()
            + r["pos"].sum()
            + r["mt"].astype(jnp.int64).sum()
            + r["use_skew"].astype(jnp.int64).sum()
        )

    def stage_d(arrays, fw):
        r = sshash_k2u(arrays["k2u"], fw, jnp, mode="main", probe_limit=plim)
        p = _project_fused(arrays, r, jnp)
        return (
            jnp.where(p["valid"], p["ref_pos"], 0).sum()
            + jnp.where(p["valid"], p["ref_id"], 0).sum()
            + p["overflow"].astype(jnp.int64).sum()
        )

    def stage_e(arrays, fw):
        r = sshash_k2u(arrays["k2u"], fw, jnp, mode="main", probe_limit=plim)
        p = _project_fused(arrays, r, jnp)
        lanes, n_ovf = flagged_lanes(p["overflow"], M2, jnp)
        return (
            jnp.where(p["valid"], p["ref_pos"], 0).sum()
            + jnp.where(p["valid"], p["ref_id"], 0).sum()
            + lanes.sum()
            + n_ovf
        )

    def stage_f(arrays, fw):
        from mazu_tpu.index.pipeline import OneGraphIndexQuery

        out = get_ref_pos_compact(
            arrays, fw, jnp, mo, merge=False, probe_limit=plim, m2=M2
        )
        return OneGraphIndexQuery.checksum(out, jnp)

    for tag, fn in (
        ("A minhash", stage_a),
        ("B +bucket-bounds gather", stage_b),
        ("C main k2u plim2", stage_c),
        ("D +fused projection", stage_d),
        ("E +hier compaction", stage_e),
        ("F full compact pass", stage_f),
    ):
        try:
            timeit(tag, scan_over(fn))
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")

    # CH / batch scaling through the bench driver
    for tag, env in (
        ("1graph CH=32", {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_CHUNKS": "32"}),
        (
            "1graph 2M x8",
            {
                "MAZU_BENCH_MODE": "1graph",
                "MAZU_BENCH_CHUNKS": "8",
                "MAZU_BENCH_BATCH": str(1 << 21),
            },
        ),
    ):
        saved = dict(os.environ)
        os.environ.update(env)
        t0 = time.time()
        log(f"=== {tag} ===")
        try:
            bench.main()
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {e}")
        log(f"[{tag}] total {time.time()-t0:.0f}s")
        os.environ.clear()
        os.environ.update(saved)


if __name__ == "__main__":
    main()
