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
