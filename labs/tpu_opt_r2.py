"""Round-2 TPU session #2: exact-fit capacities + packed-scan split + reads
at 1M-lane chunks + compaction component attribution. One process.
Run: timeout 3000 python tpu_opt_r2.py > /tmp/tpu_opt_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
import json
import os
import sys
import time

import numpy as np

import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(tag, env):
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


def components():
    import jax
    import jax.numpy as jnp

    from mazu_tpu.ops.compact import flagged_lanes, flagged_lanes2
    from mazu_tpu.ops.scan import prefix_sum

    rng = np.random.default_rng(0)
    N = 1 << 20
    flags = rng.random(N) < 0.0305
    fb = (rng.random(N) < 0.0196) & ~flags
    fa = flags & ~fb
    d_a = jax.device_put(jnp.asarray(fa))
    d_b = jax.device_put(jnp.asarray(fb))
    d_f = jax.device_put(jnp.asarray(flags))

    def timeit(tag, fn, *args, iters=20):
        o = jax.device_get(fn(*args))
        t0 = time.time()
        for _ in range(iters):
            o = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(o)[0])
        dt = (time.time() - t0) / iters
        log(f"[{tag}] {dt*1e3:.2f} ms")

    scan1 = jax.jit(lambda f: prefix_sum(f.astype(jnp.int32), jnp, max_value=1)[-1])
    timeit("scan only (1ch, 1M)", scan1, d_f)

    for M in (16384, 32256, 40960):
        fl = jax.jit(lambda f, M=M: flagged_lanes(f, M, jnp))
        timeit(f"flagged_lanes M={M}", fl, d_f)
    fl2 = jax.jit(lambda a, b: flagged_lanes2(a, b, 11648, 20736, jnp))
    timeit("flagged_lanes2 packed (11648,20736)", fl2, d_a, d_b)


def main():
    # a) component attribution first (fast compiles)
    components()
    # b) plain 1graph with exact-fit M2 (32256 for the 31971-lane workload)
    run("1graph-exactfit", {"MAZU_BENCH_MODE": "1graph"})
    # c) split with tight budgets + single packed scan
    run("1graph-split-tight", {"MAZU_BENCH_MODE": "1graph", "MAZU_BENCH_M2B": "auto"})
    # d) reads at 1M-lane chunks
    run(
        "reads-1M",
        {
            "MAZU_BENCH_MODE": "reads1graph",
            "MAZU_BENCH_BATCH": str(1 << 20),
            "MAZU_BENCH_CHUNKS": "8",
        },
    )


if __name__ == "__main__":
    main()
