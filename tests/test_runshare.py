"""Run-sharing read kernel: exact equality with the plain batched path."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mazu_tpu.index.modindex import ModIndex
from mazu_tpu.io.pf1_index import load_dense_index
from mazu_tpu.kmer import revcomp
from mazu_tpu.kphf.runshare import sshash_k2u_reads_runshare
from mazu_tpu.kphf.sshash import SSHash, sshash_k2u

from conftest import TEST_DATA

YEAST = os.path.join(TEST_DATA, "pf1", "yeast_chr01_index")


@pytest.fixture(scope="module")
def setup():
    if not os.path.isdir(YEAST):
        pytest.skip("fixture missing")
    base = load_dense_index(YEAST)
    ss = SSHash.from_unitig_set(
        base.k2u.unitigs, 15, skew_param=2, engine="direct", bucket_load=0.125
    )
    idx = ModIndex(ss, base.u2pos, base.refs)
    d = jax.device_put(idx.device_arrays(fused=True)["k2u"])
    return base, d


def _reads(base, n, L, seed):
    rng = np.random.default_rng(seed)
    kms_all = base.refs.ref_kmers(0, 31)
    reads, nr = [], []
    for s in rng.integers(0, len(kms_all) - L, n):
        chunk = kms_all[s : s + L].copy()
        if rng.random() < 0.5:
            chunk = revcomp(chunk, 31)[::-1].copy()
        if rng.random() < 0.2:  # inject foreign k-mers
            chunk[rng.integers(0, L)] = rng.integers(0, 1 << 62, dtype=np.uint64)
        reads.append(chunk)
        f = np.zeros(L, dtype=bool)
        f[0] = True
        nr.append(f)
    return np.concatenate(reads), np.concatenate(nr)


def test_runshare_equals_plain(setup):
    base, d = setup
    fw, nr = _reads(base, 256, 120, 0)
    r_run = {
        k: np.asarray(v)
        for k, v in sshash_k2u_reads_runshare(d, jnp.asarray(fw), jnp.asarray(nr), jnp).items()
    }
    r_ref = {
        k: np.asarray(v) for k, v in sshash_k2u(d, jnp.asarray(fw), jnp, mode="main").items()
    }
    assert not r_run["run_overflow"]
    for key in ("unitig_id", "unitig_len", "pos", "mt", "use_skew", "occ_word", "occ_cnt"):
        np.testing.assert_array_equal(r_run[key], r_ref[key], err_msg=key)


def test_read_batch_query_checksum_parity(setup):
    base, d = setup
    from mazu_tpu.index.twophase import ReadBatchQuery, TwoPhaseIndexQuery
    from mazu_tpu.kphf.sshash import SSHash

    ss = SSHash.from_unitig_set(
        base.k2u.unitigs, 15, skew_param=2, engine="direct", bucket_load=0.125
    )
    idx = ModIndex(ss, base.u2pos, base.refs)
    rq = ReadBatchQuery(idx)
    tp = TwoPhaseIndexQuery(idx)
    fw, nr = _reads(base, 128, 120, 3)
    c1, _ = rq.checksum_query(jnp.asarray(fw), fw, jnp.asarray(nr))
    c2, _ = tp.checksum_query(jnp.asarray(fw), fw)
    assert c1 == c2
