"""Per-stage timing of the SSHash query pipeline on the TPU: isolates
minimizer computation, bucket lookup, probe loop, and projection to find
the pathological stage. Run standalone on the TPU."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import os
import time

import numpy as np

pass  # compilation cache disabled: axon remote-compile may not support executable serialization

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def timeit(fn, *args, iters=10):
    """Sync via device_get of the (scalar) result — robust to async quirks."""
    jax.device_get(fn(*args))
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    out = jax.device_get(r)
    return (time.time() - t) / iters, out


def calibrate():
    """Sync floor + chained-gather scaling (each gather depends on the last,
    so latency can't hide)."""
    N, M = 1 << 20, 1 << 22
    rng = np.random.default_rng(0)
    tbl = jax.device_put(jnp.asarray(rng.integers(0, M, M, dtype=np.int32)))
    idx = jax.device_put(jnp.asarray(rng.integers(0, M, N, dtype=np.int32)))

    @jax.jit
    def empty(i):
        return i[0]

    def chain(n):
        @jax.jit
        def f(t, i):
            x = i
            for _ in range(n):
                x = t[x]
            return x.astype(jnp.int64).sum()

        return f

    print("calibrate: compiling empty kernel...", flush=True)
    dt, _ = timeit(empty, idx)
    print(f"sync floor: {dt*1e3:.3f} ms", flush=True)
    prev = None
    for n in (1, 2, 4, 8, 16):
        f = chain(n)
        dt, _ = timeit(f, tbl, idx)
        marg = "" if prev is None else f" (+{(dt-prev)*1e3:.3f} ms/8 gathers)" if n == 16 else ""
        print(f"chained gathers x{n}: {dt*1e3:.3f} ms ({N*n/dt/1e9:.2f} G gathers/s){marg}", flush=True)
        prev = dt


def main():
    calibrate()
    from mazu_tpu.io.pf1_index import load_dense_index
    from mazu_tpu.kphf.sshash import SSHash, sshash_k2u
    from mazu_tpu.kmer import canonical_minimizer_batch, revcomp
    from mazu_tpu.kphf.boophf32 import fold_hash32
    from mazu_tpu.containers.unitig_set import us_get_kmer
    from mazu_tpu.bits.bitvector import bv_rank

    base = load_dense_index("/root/reference/test_data/pf1/yeast_chr01_index")
    us = base.k2u.unitigs
    ss = SSHash.from_unitig_set(us, 15, skew_param=4, engine="direct")
    d = jax.device_put(ss.device_arrays())
    k, w = ss.k, ss.w

    kms = base.refs.ref_kmers(0, k)
    N = 1 << 20
    work = np.tile(kms, -(-N // len(kms)))[:N]
    rng = np.random.default_rng(0)
    rng.shuffle(work)
    work = jax.device_put(jnp.asarray(work))

    @jax.jit
    def s_revcomp(fw):
        return revcomp(fw, k).sum()

    @jax.jit
    def s_minimizer(fw):
        mm, off, isfw, canon = canonical_minimizer_batch(jnp, fw, k, w, 0, hash32=True)
        return mm.sum() + off.sum()

    @jax.jit
    def s_bucket(fw):
        mm, off, _, _ = canonical_minimizer_batch(jnp, fw, k, w, 0, hash32=True)
        hc = (fold_hash32(mm) & np.uint32(ss.direct_T - 1)).astype(jnp.int64)
        ps = d["prefix"]["flat"][hc].astype(jnp.int64)
        pe = d["prefix"]["flat"][hc + 1].astype(jnp.int64)
        return ps.sum() + pe.sum()

    @jax.jit
    def s_fetch(fw):
        # emulate one probe: pos gather + kmer fetch + rank
        mm, off, _, _ = canonical_minimizer_batch(jnp, fw, k, w, 0, hash32=True)
        hc = (fold_hash32(mm) & np.uint32(ss.direct_T - 1)).astype(jnp.int64)
        ps = d["prefix"]["flat"][hc].astype(jnp.int64)
        mm_pos = d["pos"]["flat"][jnp.clip(ps, 0, len(ss.pos) - 1)].astype(jnp.int64)
        km_pos = jnp.clip(mm_pos - off.astype(jnp.int64), 0, us.total_len - k)
        kw = us_get_kmer(d["us"], km_pos, jnp)
        uid = bv_rank(d["us"]["bv"], km_pos, jnp)
        return kw.sum() + uid.sum()

    @jax.jit
    def s_full(fw):
        r = sshash_k2u(d, fw, jnp)
        return r["unitig_id"].sum() + r["pos"].sum() + r["mt"].astype(jnp.int64).sum()

    for name, fn in [
        ("revcomp", s_revcomp),
        ("minimizer(17win,mix32)", s_minimizer),
        ("minimizer+bucket", s_bucket),
        ("minimizer+bucket+1probe", s_fetch),
        ("full k2u (direct)", s_full),
    ]:
        t0 = time.time()
        jax.device_get(fn(work))
        compile_t = time.time() - t0
        dt, _ = timeit(fn, work)
        print(f"{name}: {dt*1e3:.3f} ms/batch ({N/dt/1e6:.1f} M q/s) [compile {compile_t:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
