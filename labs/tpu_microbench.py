"""TPU microbenchmarks: separate launch/tunnel overhead from kernel cost.

Times (a) a trivial elementwise kernel, (b) u64 vs u32 random gathers,
(c) u64 vs u32 elementwise mix-hash chains — the primitives that dominate
the query pipeline. Run standalone on the TPU (not while bench.py runs).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t) / iters


def main():
    N = 1 << 20
    M = 1 << 22
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.uint64))
    x32 = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.uint32))
    tbl64 = jnp.asarray(rng.integers(0, 1 << 62, M, dtype=np.uint64))
    tbl32 = jnp.asarray(rng.integers(0, 1 << 31, M, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, M, N))

    @jax.jit
    def trivial(x):
        return (x * np.uint64(3)).sum()

    @jax.jit
    def gather64(t, i):
        return t[i].sum()

    @jax.jit
    def gather32(t, i):
        return t[i].sum()

    @jax.jit
    def gather64x8(t, i):
        s = 0
        for j in range(8):
            s = s + t[(i + j * 1315423911) % M].sum()
        return s

    @jax.jit
    def mix64(x):
        z = x
        for _ in range(8):
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        return z.sum()

    @jax.jit
    def mix32(x):
        z = x
        for _ in range(8):
            z = (z ^ (z >> np.uint32(15))) * np.uint32(0x85EBCA6B)
        return z.sum()

    for name, fn, args in [
        ("trivial_u64_mul_sum", trivial, (x64,)),
        ("gather_u64_1M_from_4M", gather64, (tbl64, idx)),
        ("gather_u32_1M_from_4M", gather32, (tbl32, idx)),
        ("gather_u64_8x", gather64x8, (tbl64, idx)),
        ("mix64_x8", mix64, (x64,)),
        ("mix32_x8", mix32, (x32,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:.3f} ms  ({N/dt/1e9:.3f} G elems/s)")


if __name__ == "__main__":
    main()
