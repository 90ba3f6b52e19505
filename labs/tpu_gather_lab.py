"""Gather strategy lab: XLA TPU element gathers run ~0.13 G/s (measured).
Test alternative formulations for random access:

1. element gather (baseline)
2. row gather [M/128, 128] + one-hot MXU in-row selection
3. row gather + take_along_axis minor-dim selection
4. one-hot matmul gather for a SMALL table (fits MXU streaming)
5. element gather from a small table (does table size matter?)
"""

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
    rng = np.random.default_rng(0)

    for M in (1 << 14, 1 << 18, 1 << 22):
        tbl = jax.device_put(jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.int32)))
        idx_np = rng.integers(0, M, N, dtype=np.int32)
        idx = jax.device_put(jnp.asarray(idx_np))
        tbl2d = tbl.reshape(M // 128, 128)
        want = int(np.asarray(tbl)[idx_np].astype(np.int64).sum())

        @jax.jit
        def elem(t, i):
            return t[i].astype(jnp.int64).sum()

        @jax.jit
        def row_onehot(t2, i):
            rows = t2[i >> 7]  # [N, 128]
            oh = jax.nn.one_hot(i & 127, 128, dtype=jnp.float32)
            picked = jnp.einsum(
                "nk,nk->n", rows.astype(jnp.float32), oh, preferred_element_type=jnp.float32
            )
            return picked.astype(jnp.int64).sum()

        @jax.jit
        def row_take(t2, i):
            rows = t2[i >> 7]  # [N, 128]
            picked = jnp.take_along_axis(rows, (i & 127)[:, None], axis=1)[:, 0]
            return picked.astype(jnp.int64).sum()

        results = {}
        for name, fn, args in (
            ("elem", elem, (tbl, idx)),
            ("row+onehot", row_onehot, (tbl2d, idx)),
            ("row+take", row_take, (tbl2d, idx)),
        ):
            try:
                got = int(jax.device_get(fn(*args)))
                ok = "OK" if got == want else f"WRONG({got}!={want})"
                dt = timeit(fn, *args)
                p(f"M=2^{int(np.log2(M))} {name}: {dt*1e3:.3f} ms ({N/dt/1e9:.3f} G/s) {ok}")
            except Exception as e:
                p(f"M=2^{int(np.log2(M))} {name}: FAILED {type(e).__name__} {str(e)[:120]}")

    # full one-hot MXU gather from small table
    M = 1 << 13
    tbl = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 15, M, dtype=np.int32)).astype(jnp.bfloat16)
    )
    idxs = rng.integers(0, M, N, dtype=np.int32)
    idx = jax.device_put(jnp.asarray(idxs))

    @jax.jit
    def oh_full(t, i):
        oh = jax.nn.one_hot(i, M, dtype=jnp.bfloat16)  # [N, M]
        return (oh @ t).astype(jnp.float32).sum()

    try:
        dt = timeit(oh_full, tbl, idx, iters=3)
        p(f"one-hot MXU gather M=2^13: {dt*1e3:.3f} ms ({N/dt/1e9:.3f} G/s)")
    except Exception as e:
        p(f"one-hot MXU: FAILED {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
