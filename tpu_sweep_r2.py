"""Round-2 TPU sweep: 1graph driver config sweep + component attribution.

One process, one index family (yeast chr01), several jitted variants —
the remote-compile service stalls per process, so everything batches here.
Run: timeout 1800 python tpu_sweep_r2.py 2>&1 | tee /tmp/sweep_r2.log
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("MAZU_BENCH_SYNTH", "0")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_index
    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.index.twophase import _project_fused
    from mazu_tpu.ops.compact import flagged_lanes

    batch = 1 << 20
    CH = 16
    rng = np.random.default_rng(0)

    results = []

    def measure(tag, fn, *args, iters=3):
        t0 = time.time()
        out = fn(*args)
        out = jax.device_get(out) if not isinstance(out, tuple) else tuple(
            jax.device_get(o) for o in out
        )
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        out = jax.device_get(out) if not isinstance(out, tuple) else tuple(
            jax.device_get(o) for o in out
        )
        dt = (time.time() - t0) / iters
        log(f"[{tag}] compile+1st {tc:.1f}s, steady {dt*1e3:.1f} ms")
        results.append({"tag": tag, "compile_s": round(tc, 1), "ms": round(dt * 1e3, 2)})
        return out, dt

    # ---- index builds per skew value
    def make_workload(index):
        us = index.k2u.unitigs
        kms = us.get_kmer_u64(us.kmer_start_positions())
        from mazu_tpu.kmer import revcomp

        work = np.tile(kms, -(-batch // len(kms)))[:batch]
        flip = rng.random(batch) < 0.5
        work[flip] = revcomp(work[flip], 15 if False else index.k)
        rng.shuffle(work)
        chunks = []
        for _ in range(CH):
            c = work.copy()
            rng.shuffle(c)
            chunks.append(c)
        return np.stack(chunks)

    for skew in (4, 8):
        os.environ["MAZU_BENCH_SKEW"] = str(skew)
        index = build_index()
        stack_host = make_workload(index)
        fused_host = index.device_arrays(fused=True, pos_kind="inline2")
        d_stack = jax.device_put(jnp.asarray(stack_host))

        plims = (2, 4) if skew == 4 else (2, 8)
        for plim in plims:
            # size M2 from the host overflow count on chunk 0
            out0 = get_ref_pos_compact(
                fused_host, stack_host[0], np, max(1, index.max_occs()),
                merge=False, probe_limit=plim, m2=8192,
            )
            n_ovf = int(out0["n_ovf"])
            M2 = max(8192, -(-int(n_ovf * 1.15) // 8192) * 8192)
            log(f"skew={skew} plim={plim}: overflow {n_ovf}/{batch} -> M2={M2}")
            og = OneGraphIndexQuery(
                index, batch, n_chunks=CH, m2=M2, probe_limit=plim,
                pos_kind="inline2", host_arrays=fused_host,
            )
            (chk, worst), dt = measure(
                f"1graph skew={skew} plim={plim} M2={M2}",
                og._pass, og.arrays, d_stack,
            )
            qps = batch * CH / dt
            results[-1]["qps_M"] = round(qps / 1e6, 1)
            results[-1]["n_ovf"] = n_ovf
            log(f"  -> {qps/1e6:.1f}M q/s (worst_ovf={int(worst)})")

        if skew == 4:
            # ---- component attribution at skew=4, plim=2
            arrays = og.arrays
            one = d_stack[0]

            @jax.jit
            def main_only(arrays, fw):
                r = sshash_k2u(arrays["k2u"], fw, jnp, mode="main", probe_limit=2)
                p = _project_fused(arrays, r, jnp)
                return (
                    jnp.where(p["valid"], p["ref_pos"], 0).sum()
                    + r["unitig_id"].sum()
                )

            measure("main+proj only (1 chunk)", main_only, arrays, one)

            @jax.jit
            def main_compact(arrays, fw):
                r = sshash_k2u(arrays["k2u"], fw, jnp, mode="main", probe_limit=2)
                p = _project_fused(arrays, r, jnp)
                ovf = p["overflow"] | r["unresolved"]
                lanes, n_ovf = flagged_lanes(ovf, 40960, jnp)
                return lanes.sum() + n_ovf + r["unitig_id"].sum()

            measure("main+proj+compact (1 chunk)", main_compact, arrays, one)

            # full single-chunk compact (phase2 included)
            @jax.jit
            def full_one(arrays, fw):
                out = get_ref_pos_compact(
                    arrays, fw, jnp, max(1, index.max_occs()),
                    merge=False, probe_limit=2, m2=40960,
                )
                return OneGraphIndexQuery.checksum(out, jnp)

            measure("full compact (1 chunk)", full_one, arrays, one)

    # ---- M2 sensitivity at best config (skew=4, plim=2)
    os.environ["MAZU_BENCH_SKEW"] = "4"
    index = build_index()
    stack_host = make_workload(index)
    fused_host = index.device_arrays(fused=True, pos_kind="inline2")
    d_stack = jax.device_put(jnp.asarray(stack_host))
    for M2 in (16384, 65536):
        og = OneGraphIndexQuery(
            index, batch, n_chunks=CH, m2=M2, probe_limit=2,
            pos_kind="inline2", host_arrays=fused_host,
        )
        (chk, worst), dt = measure(
            f"1graph skew=4 plim=2 M2={M2}", og._pass, og.arrays, d_stack
        )
        results[-1]["qps_M"] = round(batch * CH / dt / 1e6, 1)
        log(f"  -> {batch*CH/dt/1e6:.1f}M q/s (worst={int(worst)})")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
