"""Round-2 TPU lab: masked-gather cost curve + compile-cache probe.

Hypothesis (from round-1 facts: consecutive/same-address gathers are
nearly free, random-base gathers pay ~10-14 ns/row): a gather whose
inactive lanes are pointed at address 0 costs ~ (active_fraction x full
random cost). If true, skew resolution + multi-occurrence projection can
ride in the MAIN kernel as masked gathers — one kernel, no host-compacted
phase 2.

Timing: in-jit iteration loops (lax.fori_loop) with a data dependence on
the carry — the host-visible sync floor varies 3-28 ms on the tunnel and
single-call timings lie.
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
# persistent compile cache probe: write everything, no minimums
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception as e:  # pragma: no cover
    print("cache config failed:", e)


def p(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    p(f"devices: {jax.devices()}")
    N = 1 << 20
    M = 1 << 22
    C = 14  # u32 cols = 56B rows (the fused inline row width)
    ITERS = 20
    rng = np.random.default_rng(0)

    tbl = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, (M, C), dtype=np.uint32)))
    ridx = jax.device_put(jnp.asarray(rng.integers(0, M, N, dtype=np.int32)))

    # ---- A. masked gather curve ------------------------------------------
    def masked_gather_bench(frac):
        act = jax.device_put(jnp.asarray(rng.random(N) < frac))

        @jax.jit
        def f(tbl, ridx, act):
            def body(i, carry):
                s, d = carry
                ix = jnp.where(act, (ridx + d) & (M - 1), 0)
                rows = tbl[ix]
                v = rows[:, 0].astype(jnp.int64).sum() + rows[:, C - 1].astype(jnp.int64).sum()
                return (s + v, (v & 1023).astype(jnp.int32))

            s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.int64(0), jnp.int32(0)))
            return s

        t0 = time.time()
        jax.device_get(f(tbl, ridx, act))
        tc = time.time() - t0
        t0 = time.time()
        r = jax.device_get(f(tbl, ridx, act))
        dt = (time.time() - t0) / ITERS
        p(f"masked gather f={frac:5.2f}: {dt*1e3:7.3f} ms/1M ({N/dt/1e6:7.1f} M rows/s) [compile {tc:.0f}s]")
        return dt

    p("---- A. masked row gather ([4M,14] u32 table) vs active fraction")
    base_dt = None
    for frac in (1.0, 0.5, 0.25, 0.10, 0.05, 0.02, 0.0):
        dt = masked_gather_bench(frac)
        if frac == 1.0:
            base_dt = dt

    # ---- A2. masked NARROW gather (8B pair rows, the prefix table) -------
    tbl2 = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, (M, 2), dtype=np.int32)))

    def masked_pair_bench(frac):
        act = jax.device_put(jnp.asarray(rng.random(N) < frac))

        @jax.jit
        def f(tbl2, ridx, act):
            def body(i, carry):
                s, d = carry
                ix = jnp.where(act, (ridx + d) & (M - 1), 0)
                rows = tbl2[ix]
                v = rows[:, 0].astype(jnp.int64).sum() + rows[:, 1].astype(jnp.int64).sum()
                return (s + v, (v & 1023).astype(jnp.int32))

            s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.int64(0), jnp.int32(0)))
            return s

        t0 = time.time()
        jax.device_get(f(tbl2, ridx, act))
        tc = time.time() - t0
        t0 = time.time()
        jax.device_get(f(tbl2, ridx, act))
        dt = (time.time() - t0) / ITERS
        p(f"masked pair gather f={frac:5.2f}: {dt*1e3:7.3f} ms/1M ({N/dt/1e6:7.1f} M rows/s) [compile {tc:.0f}s]")

    p("---- A2. masked pair gather ([4M,2] i32)")
    for frac in (1.0, 0.10, 0.0):
        masked_pair_bench(frac)

    # ---- B. consecutive block fetch width (projection occ block) ---------
    # occ block: rows [start, start+W) consecutive — W strided gathers.
    p("---- B. masked consecutive block fetch (W consecutive u64 rows)")
    otbl = jax.device_put(jnp.asarray(rng.integers(0, 1 << 60, M, dtype=np.uint64)))

    def block_bench(W, frac):
        act = jax.device_put(jnp.asarray(rng.random(N) < frac))

        @jax.jit
        def f(otbl, ridx, act):
            def body(i, carry):
                s, d = carry
                ix = jnp.where(act, (ridx + d) & (M - 1 - W), 0)
                v = jnp.int64(0)
                for j in range(W):
                    v = v + otbl[ix + j].astype(jnp.int64).sum()
                return (s + v, (v & 1023).astype(jnp.int32))

            s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.int64(0), jnp.int32(0)))
            return s

        t0 = time.time()
        jax.device_get(f(otbl, ridx, act))
        tc = time.time() - t0
        t0 = time.time()
        jax.device_get(f(otbl, ridx, act))
        dt = (time.time() - t0) / ITERS
        p(f"block W={W} f={frac:5.2f}: {dt*1e3:7.3f} ms/1M ({N/dt/1e6:7.1f} M blk/s) [compile {tc:.0f}s]")

    for W in (4, 8):
        for frac in (1.0, 0.05):
            block_bench(W, frac)

    p("done — rerun this script to check the persistent compile cache "
      "(compile times should drop to ~0 on hit)")


if __name__ == "__main__":
    main()
