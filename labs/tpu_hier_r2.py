"""Round-2 TPU session #4: hierarchical rank-select compaction A/B.

a) component attribution: flagged_lanes (hier) vs flagged_lanes_ss
   (round-1 searchsorted) at the real capacities, 1M lanes.
b) 1graph full pass with the hier compaction (now the library default).
c) reads1graph at 1M chunks with hier compaction.

One process (remote-compile stalls are per-process; CLAUDE.md).
Run: timeout 3000 python tpu_hier_r2.py > /tmp/tpu_hier_r2.out 2>&1
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)
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

    from mazu_tpu.ops.compact import flagged_lanes, flagged_lanes_ss

    rng = np.random.default_rng(0)
    N = 1 << 20
    flags = rng.random(N) < 0.0305
    d_f = jax.device_put(jnp.asarray(flags))

    def timeit(tag, fn, *args, iters=20):
        o = jax.device_get(jax.tree_util.tree_leaves(fn(*args))[0])
        t0 = time.time()
        for _ in range(iters):
            o = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(o)[0])
        dt = (time.time() - t0) / iters
        log(f"[{tag}] {dt*1e3:.2f} ms")

    for M in (16384, 32256, 49152):
        h = jax.jit(lambda f, M=M: flagged_lanes(f, M, jnp))
        timeit(f"hier      M={M}", h, d_f)
        s = jax.jit(lambda f, M=M: flagged_lanes_ss(f, M, jnp))
        timeit(f"searchsrt M={M}", s, d_f)
    # exactness on device vs host, real capacities
    la, na = flagged_lanes(np.asarray(flags), 32256, np)
    import jax

    dla, dna = jax.jit(lambda f: flagged_lanes(f, 32256, jnp))(d_f)
    assert int(dna) == int(na)
    np.testing.assert_array_equal(np.asarray(dla), la)
    log("[hier] device == host exact")


def main():
    components()
    run("1graph-hier", {"MAZU_BENCH_MODE": "1graph"})
    run(
        "reads-hier-1M",
        {
            "MAZU_BENCH_MODE": "reads1graph",
            "MAZU_BENCH_BATCH": str(1 << 20),
            "MAZU_BENCH_CHUNKS": "8",
        },
    )


if __name__ == "__main__":
    main()
