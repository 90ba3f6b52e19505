"""One TPU session running all pending experiments sequentially (the remote
compile service has multi-minute stalls per process; batch everything)."""

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
    from mazu_tpu.io.pf1_index import load_dense_index
    from mazu_tpu.kphf.sshash import SSHash, sshash_k2u
    from mazu_tpu.kmer import canonical_minimizer_batch, revcomp
    from mazu_tpu.kphf.boophf32 import fold_hash32
    from mazu_tpu.index.modindex import get_ref_pos_padded

    N = 1 << 20
    M = 1 << 22
    rng = np.random.default_rng(0)

    # ---- calibration: sync floor + chained gathers
    tbl = jax.device_put(jnp.asarray(rng.integers(0, M, M, dtype=np.int32)))
    idx = jax.device_put(jnp.asarray(rng.integers(0, M, N, dtype=np.int32)))

    @jax.jit
    def empty(i):
        return i[0]

    p("compiling empty...")
    dt = timeit(empty, idx)
    p(f"sync floor: {dt*1e3:.3f} ms")

    def chain(n):
        @jax.jit
        def f(t, i):
            x = i
            for _ in range(n):
                x = t[x]
            return x.astype(jnp.int64).sum()

        return f

    prev = 0.0
    for n in (1, 4, 16):
        dt = timeit(chain(n), tbl, idx)
        p(f"chained gathers x{n}: {dt*1e3:.3f} ms ({N*n/dt/1e9:.2f} G gathers/s)")
        prev = dt

    # pair gather: [M,2] row gather vs 2 gathers
    tbl2 = jax.device_put(jnp.asarray(rng.integers(0, M, (M, 2), dtype=np.int32)))

    @jax.jit
    def pairg(t2, i):
        r = t2[i]
        return r[:, 0].astype(jnp.int64).sum() + r[:, 1].astype(jnp.int64).sum()

    dt = timeit(pairg, tbl2, idx)
    p(f"pair gather [M,2]: {dt*1e3:.3f} ms ({N/dt/1e9:.2f} G rows/s)")

    # ---- stage timings on yeast chr01, direct engine, skew=2
    base = load_dense_index("/root/reference/test_data/pf1/yeast_chr01_index")
    us = base.k2u.unitigs
    ss = SSHash.from_unitig_set(us, 15, skew_param=2, engine="direct")
    d = jax.device_put(ss.device_arrays())
    k, w = ss.k, ss.w
    kms = base.refs.ref_kmers(0, k)
    work = np.tile(kms, -(-N // len(kms)))[:N]
    rng.shuffle(work)
    work = jax.device_put(jnp.asarray(work))

    @jax.jit
    def s_minimizer(fw):
        mm, off, isfw, canon = canonical_minimizer_batch(jnp, fw, k, w, 0, hash32=True)
        return mm.astype(jnp.int64).sum() + off.astype(jnp.int64).sum()

    @jax.jit
    def s_k2u(fw):
        r = sshash_k2u(d, fw, jnp)
        return (
            r["unitig_id"].sum() + r["pos"].sum() + r["mt"].astype(jnp.int64).sum()
        )

    max_occs = max(1, base.u2pos.max_occs())
    full_arrays = jax.device_put(
        {
            "k2u": ss.device_arrays(),
            "u2pos": base.u2pos.device_arrays(),
            "meta": {"k": k},
        }
    )

    from mazu_tpu.pytree import meta as mk_meta

    full_arrays["meta"] = mk_meta(k=k, index_type="bench")

    @jax.jit
    def s_full(fw):
        out = get_ref_pos_padded(full_arrays, fw, jnp, max_occs)
        return out["ref_pos"].sum() + out["ref_id"].sum() + out["unitig_id"].sum()

    for name, fn in (
        ("minimizer only", s_minimizer),
        ("k2u direct skew2 paired", s_k2u),
        ("full direct skew2 paired", s_full),
    ):
        p(f"compiling {name}...")
        t0 = time.time()
        jax.device_get(fn(work))
        p(f"  compiled in {time.time()-t0:.0f}s")
        dt = timeit(fn, work)
        p(f"{name}: {dt*1e3:.3f} ms/batch ({N/dt/1e6:.1f} M q/s)")

    # parity spot-check of the full path on device vs host
    sample = np.asarray(jax.device_get(work))[:4096]
    host_arrays = {
        "k2u": ss.device_arrays(),
        "u2pos": base.u2pos.device_arrays(),
        "meta": mk_meta(k=k, index_type="bench"),
    }
    hostr = get_ref_pos_padded(host_arrays, sample, np, max_occs)
    devr = {kk: np.asarray(v) for kk, v in jax.device_get(
        jax.jit(lambda f: get_ref_pos_padded(full_arrays, f, jnp, max_occs))(
            jnp.asarray(sample)
        )
    ).items()}
    for key in ("unitig_id", "pos", "mt", "ref_id", "ref_pos", "orient", "valid"):
        np.testing.assert_array_equal(devr[key], hostr[key], err_msg=key)
    p("parity OK (direct engine, device == host)")


if __name__ == "__main__":
    main()
