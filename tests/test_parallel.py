"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert (np.asarray(out["mt"]) > 0).all()


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bucket_sharded_matches_unsharded():
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import __graft_entry__ as g
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.parallel.sharding import make_bucket_sharded_query

    idx = g._toy_index(n_seqs=16, seq_len=150)
    kms = np.concatenate(
        [idx.refs.ref_kmers(i, idx.k) for i in range(4)]
    ).astype(np.uint64)[:256]

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "bucket"))
    qf = make_bucket_sharded_query(idx.k2u, mesh)
    sharded = {k: np.asarray(v) for k, v in qf(jnp.asarray(kms)).items()}
    plain = sshash_k2u(idx.k2u.device_arrays(prefix_kind="flat"), kms, np)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(sharded[key], np.asarray(plain[key]), err_msg=key)


def test_alltoall_routed_query_matches():
    """MoE-style all_to_all routing: each query resolved only on the shard
    owning its minimizer bucket; results equal the single-device kernel."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import __graft_entry__ as g
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.parallel.sharding import make_alltoall_sharded_query

    idx = g._toy_index(n_seqs=48, seq_len=300)
    us = idx.k2u.unitigs
    kms = us.get_kmer_u64(us.kmer_start_positions())
    rng = np.random.default_rng(3)
    n = 512
    work = np.tile(kms, -(-n // len(kms)))[:n]
    from mazu_tpu.kmer import revcomp

    flip = rng.random(n) < 0.5
    work[flip] = revcomp(work[flip], idx.k)
    miss = rng.random(n) < 0.1
    work[miss] = rng.integers(0, 1 << (2 * idx.k), int(miss.sum()), dtype=np.uint64)

    mesh = Mesh(np.array(jax.devices()[:8]), ("bucket",))
    qf = make_alltoall_sharded_query(idx.k2u, mesh)
    out = {k: np.asarray(v) for k, v in qf(jnp.asarray(work)).items()}
    assert out["routed_ok"].all()
    want = sshash_k2u(idx.k2u.device_arrays(), work, np)
    for kk in ("mt", "unitig_id", "unitig_len", "pos"):
        np.testing.assert_array_equal(out[kk], np.asarray(want[kk]), err_msg=kk)
