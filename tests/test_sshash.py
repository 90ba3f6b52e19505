"""SSHash tests mirroring the reference suite (src/kphf/sshash.rs:627-885):
tiny k2u goldens across window sizes, self-validation with/without skew
index, skew-all equivalence, shared-minimizer edge case, and the piscem
index end-to-end on yeast chr7."""

import os

import numpy as np
import pytest

from mazu_tpu import MATCH_TWIN
from mazu_tpu.containers.unitig_set import UnitigSet
from mazu_tpu.index.piscem_index import piscem_index_from_cf_prefix
from mazu_tpu.index.validate import validate_fasta, validate_k2u_self
from mazu_tpu.io.cuttlefish import CfFiles
from mazu_tpu.kmer import kmer_from_str, revcomp
from mazu_tpu.kphf.sshash import SSHash, sshash_k2u

from conftest import TEST_DATA

TINY = os.path.join(TEST_DATA, "cf", "tiny", "tiny")
YEAST = os.path.join(TEST_DATA, "cf", "yeast_chr7", "yeast_chr7")


@pytest.fixture(scope="module")
def tiny_unitigs():
    if not os.path.exists(TINY + ".cf_seg"):
        pytest.skip("tiny cf fixture missing")
    us, _ = UnitigSet.from_cf(CfFiles(TINY))
    return us


GOLDENS = [
    ("CACACAC", (0, 10, 0)),
    ("ACACACC", (0, 10, 1)),
    ("ACACCAC", (0, 10, 3)),
    ("CCTCAAT", (1, 10, 0)),
    ("CAATACG", (1, 10, 3)),
]


@pytest.mark.parametrize("w", [3, 5])
def test_tiny_goldens(tiny_unitigs, w):
    ss = SSHash.from_unitig_set_no_skew_index(tiny_unitigs, w)
    d = ss.device_arrays()
    for s, (uid, ulen, pos) in GOLDENS:
        km = np.array([kmer_from_str(s)], dtype=np.uint64)
        r = sshash_k2u(d, km, np)
        assert (
            int(r["unitig_id"][0]),
            int(r["unitig_len"][0]),
            int(r["pos"][0]),
            int(r["mt"][0]),
        ) == (uid, ulen, pos, 1), s
        r = sshash_k2u(d, revcomp(km, 7), np)
        assert (int(r["unitig_id"][0]), int(r["pos"][0]), int(r["mt"][0])) == (
            uid,
            pos,
            MATCH_TWIN,
        ), s
    r = sshash_k2u(d, np.array([kmer_from_str("AAAAAAA")], dtype=np.uint64), np)
    assert int(r["mt"][0]) == 0


@pytest.mark.parametrize("w", [1, 3, 7])
@pytest.mark.parametrize("skew", [None, 0, 2])
def test_tiny_validate_self(tiny_unitigs, w, skew):
    ss = SSHash.from_unitig_set(tiny_unitigs, w, skew_param=skew)
    validate_k2u_self(ss)


def test_skew_all(tiny_unitigs):
    ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=0)
    assert ss.n_kmers_in_skew_index == ss.n_kmers
    no_skew = SSHash.from_unitig_set_no_skew_index(tiny_unitigs, 3)
    assert ss.num_bits() > no_skew.num_bits()


def test_unitigs_share_mmer():
    seqs = [
        "ACAACTTACCCTCCATTACCCTACCTCCCCA",
        "CAACTTACCCTCCATTACCCTACCTCCCCAC",
    ]
    us = UnitigSet.from_seqs(seqs, 31)
    ss = SSHash.from_unitig_set_no_skew_index(us, 15)
    validate_k2u_self(ss)


def test_ef_and_flat_prefix_agree(tiny_unitigs):
    ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=2)
    km = np.array([kmer_from_str(s) for s, _ in GOLDENS], dtype=np.uint64)
    r_ef = sshash_k2u(ss.device_arrays(prefix_kind="ef"), km, np)
    r_flat = sshash_k2u(ss.device_arrays(prefix_kind="flat"), km, np)
    for key in r_ef:
        np.testing.assert_array_equal(r_ef[key], r_flat[key])


def test_jnp_matches_np(tiny_unitigs):
    import jax.numpy as jnp

    ss = SSHash.from_unitig_set(tiny_unitigs, 5, skew_param=2)
    d = ss.device_arrays()
    pos = tiny_unitigs.kmer_start_positions()
    kms = tiny_unitigs.get_kmer_u64(pos)
    r_np = sshash_k2u(d, kms, np)
    r_j = sshash_k2u(d, jnp.asarray(kms), jnp)
    for key in r_np:
        np.testing.assert_array_equal(np.asarray(r_j[key]), r_np[key])


@pytest.mark.slow
def test_yeast_piscem_validate_fasta():
    if not os.path.exists(YEAST + ".cf_seg"):
        pytest.skip("yeast cf fixture missing")
    idx = piscem_index_from_cf_prefix(YEAST, w=15, skew_param=32)
    ss = idx.k2u
    assert ss.n_minimizers < idx.n_kmers
    assert ss.n_kmers_in_skew_index > 0
    validate_fasta(idx, YEAST + ".fa")


class TestFast32Engine:
    def test_boophf32_minimal_perfect(self):
        from mazu_tpu.kphf.boophf32 import BooPHF32

        rng = np.random.default_rng(2)
        keys = np.unique(rng.integers(0, 1 << 62, 20000, dtype=np.uint64))
        m = BooPHF32.build(keys)
        v = m.lookup(keys)
        assert sorted(v.tolist()) == list(range(len(keys)))
        # foreign keys: in-range false positives or -1, never out of range
        foreign = m.lookup(np.array([1 << 63], dtype=np.uint64) + keys[:50])
        assert (foreign < len(keys)).all() and (foreign >= -1).all()

    def test_boophf32_device_matches_host(self):
        import jax.numpy as jnp

        from mazu_tpu.kphf.boophf32 import BooPHF32, boophf32_lookup

        rng = np.random.default_rng(3)
        keys = np.unique(rng.integers(0, 1 << 62, 5000, dtype=np.uint64))
        m = BooPHF32.build(keys)
        d = m.device_arrays()
        np.testing.assert_array_equal(
            np.asarray(boophf32_lookup(d, jnp.asarray(keys), jnp)),
            boophf32_lookup(d, keys, np),
        )

    @pytest.mark.parametrize("w", [3, 5, 7])
    def test_tiny_fast32_validate(self, tiny_unitigs, w):
        ss = SSHash.from_unitig_set(tiny_unitigs, w, skew_param=2, engine="fast32")
        assert ss.hash32
        validate_k2u_self(ss)

    def test_fast32_goldens(self, tiny_unitigs):
        ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=2, engine="fast32")
        d = ss.device_arrays()
        for s, (uid, ulen, pos) in GOLDENS:
            km = np.array([kmer_from_str(s)], dtype=np.uint64)
            r = sshash_k2u(d, km, np)
            assert (
                int(r["unitig_id"][0]),
                int(r["unitig_len"][0]),
                int(r["pos"][0]),
                int(r["mt"][0]),
            ) == (uid, ulen, pos, 1), s
        r = sshash_k2u(d, np.array([kmer_from_str("AAAAAAA")], dtype=np.uint64), np)
        assert int(r["mt"][0]) == 0

    def test_fast32_jnp_matches_np(self, tiny_unitigs):
        import jax.numpy as jnp

        ss = SSHash.from_unitig_set(tiny_unitigs, 5, skew_param=2, engine="fast32")
        d = ss.device_arrays()
        pos = tiny_unitigs.kmer_start_positions()
        kms = tiny_unitigs.get_kmer_u64(pos)
        r_np = sshash_k2u(d, kms, np)
        r_j = sshash_k2u(d, jnp.asarray(kms), jnp)
        for key in r_np:
            np.testing.assert_array_equal(np.asarray(r_j[key]), r_np[key])


class TestDirectEngine:
    @pytest.mark.parametrize("w", [3, 5, 7])
    def test_tiny_direct_validate(self, tiny_unitigs, w):
        ss = SSHash.from_unitig_set(tiny_unitigs, w, skew_param=2, engine="direct")
        assert ss.direct_T and ss.mphf is None
        validate_k2u_self(ss)

    def test_direct_goldens_and_miss(self, tiny_unitigs):
        ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=2, engine="direct")
        d = ss.device_arrays()
        for s, (uid, ulen, pos) in GOLDENS:
            km = np.array([kmer_from_str(s)], dtype=np.uint64)
            r = sshash_k2u(d, km, np)
            assert (
                int(r["unitig_id"][0]),
                int(r["unitig_len"][0]),
                int(r["pos"][0]),
                int(r["mt"][0]),
            ) == (uid, ulen, pos, 1), s
        r = sshash_k2u(d, np.array([kmer_from_str("AAAAAAA")], dtype=np.uint64), np)
        assert int(r["mt"][0]) == 0

    def test_direct_jnp_matches_np(self, tiny_unitigs):
        import jax.numpy as jnp

        ss = SSHash.from_unitig_set(tiny_unitigs, 5, skew_param=2, engine="direct")
        d = ss.device_arrays()
        pos = tiny_unitigs.kmer_start_positions()
        kms = tiny_unitigs.get_kmer_u64(pos)
        r_np = sshash_k2u(d, kms, np)
        r_j = sshash_k2u(d, jnp.asarray(kms), jnp)
        for key in r_np:
            np.testing.assert_array_equal(np.asarray(r_j[key]), r_np[key])


def test_two_phase_equals_full(tiny_unitigs):
    from mazu_tpu.kphf.sshash import TwoPhaseSSHash

    ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=2, engine="direct")
    pos = tiny_unitigs.kmer_start_positions()
    kms = tiny_unitigs.get_kmer_u64(pos)
    tp = TwoPhaseSSHash(ss)
    r2 = tp.k2u(kms)
    r1 = sshash_k2u(ss.device_arrays(), kms, np)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(r2[key], np.asarray(r1[key]), err_msg=key)


def test_edge_queries(tiny_unitigs):
    ss = SSHash.from_unitig_set(tiny_unitigs, 3, skew_param=2, engine="direct")
    d = ss.device_arrays()
    # empty batch
    r = sshash_k2u(d, np.zeros(0, dtype=np.uint64), np)
    assert r["mt"].shape == (0,)
    # extreme words: all-A (0) and all-T (max) of k=7
    ext = np.array([0, (1 << 14) - 1], dtype=np.uint64)
    r = sshash_k2u(d, ext, np)
    assert (np.asarray(r["mt"]) == 0).all()  # neither is indexed
