"""Pufferfish sparse (SampledPFHash) index parity tests
(reference src/pf1/sparse_index.rs:145-193)."""

import os

import pytest

from mazu_tpu.index.validate import validate_k2u_self, validate_self
from mazu_tpu.io.pf1_index import load_sparse_index

from conftest import TEST_DATA

SPARSE = os.path.join(TEST_DATA, "pf1", "small_txome_index_sparse")


@pytest.fixture(scope="module")
def sparse():
    if not os.path.isdir(SPARSE):
        pytest.skip("sparse fixture missing")
    return load_sparse_index(SPARSE)


def test_structure(sparse):
    assert sparse.index_type == "PF1Sparse"
    assert sparse.k2u.sample_size == 9
    assert sparse.k2u.extension_size == 4


def test_k2u_self(sparse):
    validate_k2u_self(sparse.k2u)


def test_validate_self(sparse):
    validate_self(sparse)


def test_sshash_drop_in(sparse):
    """Swap the K2U behind the same U2Pos (reference src/pf1/sparse_index.rs:177-192)."""
    from mazu_tpu.index.modindex import ModIndex
    from mazu_tpu.kphf.sshash import SSHash

    ss = SSHash.from_unitig_set_no_skew_index(sparse.k2u.unitigs, 2)
    idx = ModIndex(ss, sparse.u2pos, sparse.refs)
    validate_self(idx)


class TestSampledBuild:
    """from_unitig_set BUILD (the reference leaves it todo!(),
    src/kphf/pfhash.rs:160-162); validated through the same batched
    sampled_k2u the C++-serialized fixtures exercise."""

    def test_build_random_unitigs(self):
        import numpy as np

        from mazu_tpu.containers.unitig_set import UnitigSet
        from mazu_tpu.kphf.sampled import SampledPFHash

        rng = np.random.default_rng(11)
        seqs = [
            "".join(rng.choice(list("ACGT"), int(n)))
            for n in rng.integers(31, 300, 48)
        ]
        us = UnitigSet.from_seqs(seqs, 31)
        sp = SampledPFHash.from_unitig_set(us)
        validate_k2u_self(sp)

    def test_build_tiny_cf(self):
        from mazu_tpu.containers.unitig_set import UnitigSet
        from mazu_tpu.io.cuttlefish import CfFiles
        from mazu_tpu.kphf.sampled import SampledPFHash

        tiny = os.path.join(TEST_DATA, "cf", "tiny", "tiny")
        if not os.path.exists(tiny + ".cf_seg"):
            pytest.skip("fixture missing")
        us, _ = UnitigSet.from_cf(CfFiles(tiny))
        sp = SampledPFHash.from_unitig_set(us, sample_size=3, extension_size=2)
        validate_k2u_self(sp)

    def test_build_parameter_grid(self):
        """Every legal (sample_size, extension_size) pair decodes exactly."""
        import numpy as np

        from mazu_tpu.containers.unitig_set import UnitigSet
        from mazu_tpu.kphf.sampled import SampledPFHash

        rng = np.random.default_rng(5)
        seqs = [
            "".join(rng.choice(list("ACGT"), int(n)))
            for n in rng.integers(31, 120, 24)
        ]
        us = UnitigSet.from_seqs(seqs, 31)
        for s, e in ((9, 4), (7, 4), (5, 2), (2, 1), (1, 1)):
            sp = SampledPFHash.from_unitig_set(us, sample_size=s, extension_size=e)
            validate_k2u_self(sp)

    def test_build_matches_loaded_schema(self, sparse):
        """A rebuild over the pf1 fixture's own unitigs answers identically
        to the C++-built structure (positions are structure-independent)."""
        import numpy as np

        from mazu_tpu.kphf.sampled import SampledPFHash, sampled_k2u

        us = sparse.k2u.unitigs
        sp = SampledPFHash.from_unitig_set(us)
        p = us.kmer_start_positions()[:4096]
        fw = us.get_kmer_u64(p)
        a = sampled_k2u(sp.device_arrays(), fw, np)
        b = sampled_k2u(sparse.k2u.device_arrays(), fw, np)
        for key in ("unitig_id", "unitig_len", "pos", "mt"):
            assert (np.asarray(a[key]) == np.asarray(b[key])).all(), key
