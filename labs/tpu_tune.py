"""One-process TPU tuning session: engine config sweep for the yeast chr01
headline bench (avoids per-process compile-service stalls)."""

import _bootstrap  # noqa: F401  (repo root on sys.path)

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def p(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from mazu_tpu.io.pf1_index import load_dense_index
    from mazu_tpu.index.modindex import ModIndex, get_ref_pos_padded
    from mazu_tpu.index.twophase import TwoPhaseIndexQuery
    from mazu_tpu.kphf.sshash import SSHash
    from mazu_tpu.kmer import revcomp

    base = load_dense_index("/root/reference/test_data/pf1/yeast_chr01_index")
    kms = base.refs.ref_kmers(0, 31)
    rng = np.random.default_rng(0)
    flip = rng.random(len(kms)) < 0.5
    kms[flip] = revcomp(kms[flip], 31)
    N = 1 << 20
    work = np.tile(kms, -(-N // len(kms)))[:N]
    rng.shuffle(work)

    for skew, load in ((2, 0.125), (2, 0.0625), (4, 0.125), (4, 0.0625)):
        ss = SSHash.from_unitig_set(
            base.k2u.unitigs, 15, skew_param=skew, engine="direct", bucket_load=load
        )
        idx = ModIndex(ss, base.u2pos, base.refs)
        max_occs = max(1, idx.max_occs())
        arrays = jax.device_put(idx.device_arrays())
        d_work = jax.device_put(jnp.asarray(work))

        @jax.jit
        def query(fw):
            out = get_ref_pos_padded(arrays, fw, jnp, max_occs)
            return out["ref_pos"].sum() + out["ref_id"].sum() + out["unitig_id"].sum()

        t0 = time.time()
        jax.device_get(query(d_work))
        ct = time.time() - t0
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            r = query(d_work)
        jax.device_get(r)
        dt = (time.time() - t0) / iters
        p(
            f"full  skew={skew} load={load}: {N/dt/1e6:.2f} M q/s "
            f"(probe={ss.probe_bound()}, skewk={ss.n_kmers_in_skew_index}, "
            f"bpk={ss.num_bits()/ss.n_kmers:.0f}, compile {ct:.0f}s)"
        )

        tp = TwoPhaseIndexQuery(idx)
        t0 = time.time()
        tp.checksum_query(d_work, work)
        ct = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            chk, novf = tp.checksum_query(d_work, work)
        dt = (time.time() - t0) / iters
        p(f"2ph   skew={skew} load={load}: {N/dt/1e6:.2f} M q/s (ovf={novf}, compile {ct:.0f}s)")


if __name__ == "__main__":
    main()
