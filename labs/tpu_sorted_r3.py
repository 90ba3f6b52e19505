"""Round-3 lab: does ADDRESS-SORTING a query batch beat the random-gather
wall on a >cache table? (VERDICT r2 next-#5: raise the uncached mid-tier.)

Measured facts so far (STATUS/ROOFLINE): random row gathers cost ~14 ns
issue + HBM latency exposure once the table exceeds cache (~30 ns at
4-6 GB); CONSECUTIVE-address gathers are nearly free. The open question
is the middle: 1M SORTED-but-sparse addresses over a multi-GB table
(ascending page/row-buffer order, ~6 KB apart). If sorted gathers run
materially faster than random ones AND the sort cost is below the
savings, the mid-tier driver should probe in sorted order (the bench
checksum is permutation-invariant, so no unsort is even needed).

Measures, on a table of MAZU_SORT_GB (default 6) GB of 56 B rows:
  1. random-index row gather (the current mid-tier regime)
  2. sorted-index row gather (same multiset of addresses)
  3. block-sorted (sort 64K-lane blocks only — cheaper sort, partial
     locality)
  4. argsort cost of the 1M u32 keys on device (the price of entry)
  5. gather at ASCENDING addresses with a fixed stride (upper bound)

Run: timeout 1800 python labs/tpu_sorted_r3.py  (alone on the chip)
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    if os.environ.get("MAZU_SORT_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".xla_cache"),
    )
    import jax.numpy as jnp

    GB = float(os.environ.get("MAZU_SORT_GB", 6))
    N = 1 << int(os.environ.get("MAZU_SORT_LOGN", 20))
    SW = 14  # 56 B rows, the fused/mono row width
    rows = int(GB * 1e9 / (SW * 4))
    CH = int(os.environ.get("MAZU_SORT_CH", 16))
    log(f"table {rows} x {SW} u32 ({rows*SW*4/1e9:.2f} GB), {N} lanes, CH={CH}")

    # build the table ON DEVICE (a 6 GB host alloc + upload pays the page
    # fault pathology + 27 MB/s tunnel; iota math compiles to nothing)
    @jax.jit
    def make_table():
        r = jnp.arange(rows, dtype=jnp.uint32)[:, None]
        return r * jnp.uint32(2654435761) + jnp.arange(SW, dtype=jnp.uint32)[None, :]

    t0 = time.time()
    table = jax.block_until_ready(make_table())
    log(f"table built on device in {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    idx_host = rng.integers(0, rows, N).astype(np.int32)
    d_idx = jax.device_put(jnp.asarray(idx_host))

    def scan_time(fn, *args, iters=3):
        f = jax.jit(fn)
        jax.device_get(f(*args))  # compile+warm
        t0 = time.time()
        o = None
        for _ in range(iters):
            o = f(*args)
        jax.device_get(o)
        return (time.time() - t0) / iters / CH

    def gather_chunks(table, idx):
        def step(c, i):
            # distinct permutation per chunk, same multiset
            j = jnp.roll(idx, i * jnp.int64(40009))
            return c + table[j].astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def gather_chunks_sorted(table, idx):
        def step(c, i):
            j = jnp.sort(jnp.roll(idx, i * jnp.int64(40009)))
            return c + table[j].astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def gather_chunks_presorted(table, idx_sorted):
        # sort done ONCE outside: isolates the gather cost under locality.
        # The address vector must stay LOOP-VARIANT — a step body that
        # gathers the same idx_sorted every iteration is hoisted out of the
        # scan by XLA and measures ONE gather amortized over CH chunks
        # (the first run of this lab printed a bogus 10.4x from exactly
        # that). roll() keeps the same multiset in near-ascending order
        # (two ascending runs) while depending on i.
        def step(c, i):
            j = jnp.roll(idx_sorted, i)
            return c + table[j].astype(jnp.int64).sum(), c

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def gather_chunks_sorted_shifted(table, idx_sorted):
        # ascending order, DISTINCT addresses per chunk (+i mod rows):
        # pure locality effect with no repeated-address cache warmth
        def step(c, i):
            j = (idx_sorted.astype(jnp.int64) + i) % rows
            return c + table[j].astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def gather_chunks_blocksorted(table, idx):
        B = 1 << 16

        def step(c, i):
            j = jnp.roll(idx, i * jnp.int64(40009))
            j = jnp.sort(j.reshape(N // B, B), axis=1).reshape(N)
            return c + table[j].astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def gather_strided(table, _):
        # ascending fixed-stride addresses: the locality upper bound at the
        # same mean spacing
        stride = max(rows // N, 1)
        j = (jnp.arange(N, dtype=jnp.int64) * stride) % rows

        def step(c, i):
            return c + table[(j + i) % rows].astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def sort_only(idx):
        def step(c, i):
            j = jnp.sort(jnp.roll(idx, i * jnp.int64(40009)))
            return c + j.astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    def argsort_only(idx):
        def step(c, i):
            o = jnp.argsort(jnp.roll(idx, i * jnp.int64(40009)))
            return c + o.astype(jnp.int64).sum(), 0

        tot, _ = jax.lax.scan(step, jnp.int64(0), jnp.arange(CH, dtype=jnp.int64))
        return tot

    d_sorted = jax.device_put(jnp.asarray(np.sort(idx_host)))
    results = {}
    for tag, fn, args in (
        ("random", gather_chunks, (table, d_idx)),
        ("presorted", gather_chunks_presorted, (table, d_sorted)),
        ("sorted-shifted", gather_chunks_sorted_shifted, (table, d_sorted)),
        ("sort+gather", gather_chunks_sorted, (table, d_idx)),
        ("blocksort64K+gather", gather_chunks_blocksorted, (table, d_idx)),
        ("strided-ascending", gather_strided, (table, d_idx)),
        ("sort-only", sort_only, (d_idx,)),
        ("argsort-only", argsort_only, (d_idx,)),
    ):
        try:
            dt = scan_time(fn, *args)
            results[tag] = dt
            log(f"[{tag:22s}] {dt*1e3:8.2f} ms/{N>>20}M ({N/dt/1e6:8.1f} M rows/s)")
        except Exception as e:
            log(f"[{tag}] FAILED: {type(e).__name__}: {str(e)[:200]}")

    if "random" in results and "presorted" in results:
        log(
            f"locality speedup (presorted/random): "
            f"{results['random']/results['presorted']:.2f}x; "
            f"net with in-graph sort: "
            f"{results['random']/results.get('sort+gather', float('inf')):.2f}x"
        )


if __name__ == "__main__":
    main()
