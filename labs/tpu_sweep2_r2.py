"""Round-2 TPU sweep #2: fixedcap2 (no prefix gather) vs inline2 on the
BENCH workload (reference-kmer distribution, occurrence-weighted), plus
bucket_load sweep for fixedcap2.

Run: timeout 3500 python tpu_sweep2_r2.py
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_index
    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.index.pipeline import OneGraphIndexQuery
    from mazu_tpu.kmer import revcomp

    batch = 1 << 20
    CH = 16
    results = []

    def bench_workload(index):
        """bench.py's workload: every reference k-mer (occurrence-weighted),
        fw/rc mixed, tiled + shuffled."""
        k = index.k
        kms_parts = [index.refs.ref_kmers(ri, k) for ri in range(min(index.n_refs, 128))]
        kms = np.concatenate(kms_parts)
        rng = np.random.default_rng(0)
        flip = rng.random(len(kms)) < 0.5
        kms[flip] = revcomp(kms[flip], k)
        work = np.tile(kms, -(-batch // len(kms)))[:batch]
        rng.shuffle(work)
        rng3 = np.random.default_rng(7)
        chunks = []
        for _ in range(CH):
            c = work.copy()
            rng3.shuffle(c)
            chunks.append(c)
        return np.stack(chunks)

    def run(tag, index, pos_kind, load_note, stack_host, plim=2):
        fused_host = index.device_arrays(fused=True, pos_kind=pos_kind)
        rows = fused_host["k2u"]["pos"]["inline"]
        mb = rows.nbytes / 1e6
        out0 = get_ref_pos_compact(
            fused_host, stack_host[0], np, max(1, index.max_occs()),
            merge=False, probe_limit=plim, m2=max(8192, batch // 8),
        )
        n_ovf = int(out0["n_ovf"])
        M2 = max(8192, -(-int(n_ovf * 1.15) // 8192) * 8192)
        host_chk = int(OneGraphIndexQuery.checksum(out0, np))
        log(f"[{tag}] rows {rows.shape} = {mb:.0f}MB, overflow {n_ovf} -> M2={M2}")
        og = OneGraphIndexQuery(
            index, batch, n_chunks=CH, m2=M2, probe_limit=plim,
            pos_kind=pos_kind, host_arrays=fused_host,
        )
        d_stack = jax.device_put(jnp.asarray(stack_host))
        t0 = time.time()
        chk, worst = og.checksum_pass(d_stack)
        tc = time.time() - t0
        assert worst <= M2, (worst, M2)
        assert chk == CH * host_chk, (chk, CH, host_chk)
        iters = 3
        t0 = time.time()
        for _ in range(iters):
            chk, _ = og.checksum_pass(d_stack)
        dt = (time.time() - t0) / iters
        qps = batch * CH / dt
        log(f"[{tag}] compile {tc:.0f}s, {dt*1e3:.0f} ms/pass -> {qps/1e6:.1f}M q/s")
        results.append(
            {"tag": tag, "pos": pos_kind, "load": load_note, "rows_MB": round(mb),
             "n_ovf": n_ovf, "M2": M2, "ms": round(dt * 1e3, 1),
             "qps_M": round(qps / 1e6, 1), "compile_s": round(tc)}
        )

    os.environ["MAZU_BENCH_SKEW"] = "4"
    # default load 0.0625
    index = build_index()
    stack_host = bench_workload(index)
    run("inline2 load=.0625", index, "inline2", 0.0625, stack_host)
    run("fixedcap2 load=.0625", index, "fixedcap2", 0.0625, stack_host)

    # higher load = smaller fixedcap table (space knob)
    for load in (0.25, 0.5):
        os.environ["MAZU_BENCH_LOAD"] = str(load)
        index2 = build_index()
        stack2 = bench_workload(index2)
        run(f"fixedcap2 load={load}", index2, "fixedcap2", load, stack2)
    del os.environ["MAZU_BENCH_LOAD"]

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
