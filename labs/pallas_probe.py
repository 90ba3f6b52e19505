"""Feasibility probe for the fused Pallas query kernel: can Mosaic lower a
batched dynamic gather from a VMEM-resident table, and how fast is it vs
the XLA gather path? Also probes u32 hashing throughput inside a kernel.

Run standalone on the TPU (not concurrently with bench.py).
"""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t) / iters


def gather_kernel(tbl_ref, idx_ref, out_ref):
    out_ref[:] = tbl_ref[idx_ref[:]]


def hash_kernel(x_ref, out_ref):
    z = x_ref[:]
    for _ in range(8):
        z = (z ^ (z >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
    out_ref[:] = z


def main():
    N = 1 << 20
    M = 1 << 18  # 1MB u32 table -> VMEM resident
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 1 << 31, M, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))
    x = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.uint32))

    BLK = 1 << 14

    @jax.jit
    def pallas_gather(tbl, idx):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((M,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(tbl, idx)

    @jax.jit
    def xla_gather(tbl, idx):
        return tbl[idx]

    @jax.jit
    def pallas_hash(x):
        return pl.pallas_call(
            hash_kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        )(x)

    # correctness first
    want = np.asarray(tbl)[np.asarray(idx)]
    try:
        got = np.asarray(pallas_gather(tbl, idx))
        np.testing.assert_array_equal(got, want)
        print("pallas gather: CORRECT")
        dt = timeit(pallas_gather, tbl, idx)
        print(f"pallas gather: {dt*1e3:.3f} ms ({N/dt/1e9:.3f} G/s)")
    except Exception as e:
        print("pallas gather FAILED:", type(e).__name__, str(e)[:300])

    dt = timeit(xla_gather, tbl, idx)
    print(f"xla gather:    {dt*1e3:.3f} ms ({N/dt/1e9:.3f} G/s)")

    try:
        got = np.asarray(pallas_hash(x))
        z = np.asarray(x)
        for _ in range(8):
            z = (z ^ (z >> np.uint32(16))) * np.uint32(0x85EBCA6B)
        np.testing.assert_array_equal(got, z)
        dt = timeit(pallas_hash, x)
        print(f"pallas mix32x8: {dt*1e3:.3f} ms ({N/dt/1e9:.3f} G/s)")
    except Exception as e:
        print("pallas hash FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
