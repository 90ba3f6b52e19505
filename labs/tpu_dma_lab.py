"""Mosaic/Pallas random row-gather rate lab.

Question: can a hand-written TPU kernel beat the XLA gather wall
(~73M u32-rows/s, ~3GB/s effective — STATUS.md "Measured facts") for the
random bucket-row fetches that bound the whole query pipeline?

Three strategies over the same access pattern (N random (1,128) i32 rows
from a [T,128] table — 512B rows, the closest vector-unit-friendly shape
to the engine's 52-64B inline rows):
  A) vmem_loop  — table VMEM-resident; unrolled scalar fori_loop of
                  dynamically-indexed vector loads (no HBM traffic at all)
  B) dma_ring   — table in HBM; per-row async copies issued round-robin
                  over a ring of DMA semaphores (manual MLP) — measures
                  Mosaic per-DMA issue cost
  C) xla        — plain jnp table[idx] baseline (the current engine's path)

All kernels XOR-reduce the fetched rows into a (1,128) accumulator so
nothing is dead-code-eliminated and output transfer is negligible.

Run on CPU (interpret=True, tiny sizes) for correctness, then on the TPU
for rates:  python tpu_dma_lab.py [cpu|tpu]
"""


from __future__ import annotations
import _bootstrap  # noqa: F401  (repo root on sys.path)

import sys
import time

import numpy as np


def build_fns(T: int, N: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    UNROLL = 8
    RING = 8

    # ---------------- A: VMEM-resident scalar-loop gather
    def vmem_loop_kernel(idx_ref, tbl_ref, out_ref):
        def body(i, acc):
            for u in range(UNROLL):
                r = idx_ref[i * UNROLL + u]
                acc = acc ^ tbl_ref[pl.ds(r, 1), :]
            return acc

        acc = jnp.zeros((1, 128), jnp.int32)
        acc = jax.lax.fori_loop(0, N // UNROLL, body, acc)
        out_ref[:] = acc

    vmem_loop = pl.pallas_call(
        vmem_loop_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        interpret=interpret,
    )

    # ---------------- B: HBM table, pipelined per-row DMA ring
    def dma_ring_kernel(idx_ref, tbl_ref, out_ref, scratch, sems):
        def start(slot, i):
            r = idx_ref[i]
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(r, 1), :], scratch.at[slot], sems.at[slot]
            ).start()

        for s in range(RING):  # prime the ring
            start(s, s)

        def body(i, acc):
            slot = jax.lax.rem(i, RING)
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(0, 1), :], scratch.at[slot], sems.at[slot]
            ).wait()
            acc = acc ^ scratch[slot]

            @pl.when(i + RING < N)
            def _():
                start(slot, i + RING)

            return acc

        acc = jnp.zeros((1, 128), jnp.int32)
        acc = jax.lax.fori_loop(0, N, body, acc)
        out_ref[:] = acc

    dma_ring = pl.pallas_call(
        dma_ring_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((RING, 1, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((RING,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        interpret=interpret,
    )

    # ---------------- D: deployment shape — tiled gather, VMEM table,
    # indices streamed per tile, rows written back to HBM via the pipeline
    TB = min(512, N)

    def tiled_kernel(idx_ref, tbl_ref, out_ref):
        def body(j, _):
            r = idx_ref[0, j]
            out_ref[pl.ds(j, 1), :] = tbl_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, TB, body, 0)

    tiled_gather = pl.pallas_call(
        tiled_kernel,
        grid=(max(1, N // TB),),
        in_specs=[
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((T, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        interpret=interpret,
    )

    def tiled(idx, tbl):
        rows = tiled_gather(idx.reshape(1, -1), tbl)
        return jax.lax.reduce_xor(rows.astype(jnp.uint32), axes=(0,)).astype(
            jnp.int32
        )[None, :]

    tiled = jax.jit(tiled)

    # ---------------- C: XLA gather baseline (same row shape)
    @jax.jit
    def xla_gather(idx, tbl):
        rows = tbl[idx]  # [N, 128] row gather
        return jax.lax.reduce_xor(rows.astype(jnp.uint32), axes=(0,)).astype(
            jnp.int32
        )[None, :]

    return {
        "vmem_loop": vmem_loop,
        "dma_ring": dma_ring,
        "tiled": tiled,
        "xla": xla_gather,
    }


def reference(idx, tbl):
    acc = np.zeros((1, 128), np.int32)
    for r in idx:
        acc = acc ^ tbl[r][None, :]
    return acc


def main(target: str):
    import os

    if target == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    interpret = target == "cpu"
    T, N = (256, 64) if interpret else (16384, 1 << 18)  # 16K rows*512B = 8MB
    rng = np.random.default_rng(0)
    tbl = rng.integers(0, 1 << 31, size=(T, 128), dtype=np.int32)
    idx = rng.integers(0, T, size=N, dtype=np.int32)

    fns = build_fns(T, N, interpret)
    want = reference(idx, tbl)
    tbl_d, idx_d = jnp.asarray(tbl), jnp.asarray(idx)

    for name, fn in fns.items():
        try:
            t0 = time.perf_counter()
            out = np.asarray(jax.device_get(fn(idx_d, tbl_d)))
            t_compile = time.perf_counter() - t0
            ok = bool((out == want).all())
            if interpret:
                print(f"{name:10s} ok={ok} (interpret)")
                continue
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jax.device_get(fn(idx_d, tbl_d))
            dt = (time.perf_counter() - t0) / iters
            rate = N / dt / 1e6
            print(
                f"{name:10s} ok={ok} compile={t_compile:.1f}s "
                f"{dt*1e3:.2f} ms -> {rate:.1f} M rows/s "
                f"({rate*512/1e3:.1f} GB/s of 512B rows)"
            )
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cpu")
