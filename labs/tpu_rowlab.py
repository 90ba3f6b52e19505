"""Row-gather economics: cost of gathering [N, W] rows from a table for
W = 1..128, u32 vs u64 — determines the optimal inline-row layout."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=10):
    jax.device_get(fn(*args))
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(r)
    return (time.time() - t) / iters


def p(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    N = 1 << 20
    R = 1 << 18  # table rows
    rng = np.random.default_rng(0)
    idx = jax.device_put(jnp.asarray(rng.integers(0, R, N, dtype=np.int32)))

    for dtype, name in ((np.uint32, "u32"), (np.uint64, "u64")):
        for W in (1, 2, 4, 5, 8, 10, 16, 32):
            tbl = jax.device_put(
                jnp.asarray(rng.integers(0, 1 << 31, (R, W), dtype=dtype))
            )

            @jax.jit
            def g(t, i):
                rows = t[i]
                return rows.astype(jnp.int64).sum()

            dt = timeit(g, tbl, idx)
            p(f"{name} rows W={W:3d}: {dt*1e3:7.3f} ms ({N/dt/1e6:8.1f} M rows/s)")


if __name__ == "__main__":
    main()
