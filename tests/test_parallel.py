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
