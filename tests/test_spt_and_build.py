"""SPT ingestion goldens + from-scratch index builds on cuttlefish fixtures.

Mirrors reference tests: src/spt.rs:156-211 (tiny tiling goldens),
src/spt_compact.rs:416-495 (both encodings agree), src/kphf tests
(PFHash self-validation), src/index/defaults.rs:60-70 (PufferfishDense
from cf + validate_fasta).
"""

import os

import numpy as np
import pytest

from mazu_tpu.index.modindex import ModIndex
from mazu_tpu.index.spt import SPT
from mazu_tpu.index.validate import validate_fasta, validate_k2u_self
from mazu_tpu.io.cuttlefish import CfFiles
from mazu_tpu.kphf.pfhash import PFHash

from conftest import TEST_DATA

TINY = os.path.join(TEST_DATA, "cf", "tiny", "tiny")
TINY_FA = os.path.join(TEST_DATA, "cf", "tiny", "tiny.fa")
YEAST = os.path.join(TEST_DATA, "cf", "yeast_chr7", "yeast_chr7")
YEAST_FA = os.path.join(TEST_DATA, "cf", "yeast_chr7", "yeast_chr7.fa")


@pytest.fixture(scope="module")
def tiny_spt():
    if not os.path.exists(TINY + ".cf_seg"):
        pytest.skip("tiny cf fixture missing")
    return SPT.from_cf(CfFiles(TINY))


@pytest.fixture(scope="module")
def yeast_spt():
    if not os.path.exists(YEAST + ".cf_seg"):
        pytest.skip("yeast cf fixture missing")
    return SPT.from_cf(CfFiles(YEAST))


class TestUnitigSet:
    def test_tiny(self, tiny_spt):
        us = tiny_spt.unitigs
        # reference src/unitig_set.rs:353-381
        assert us.k == 7
        assert us.unitig_seq_str(0) == "CACACACCAC"
        assert us.unitig_seq_str(1) == "CCTCAATACG"
        assert int(us.unitig_len(0)) == 10 and int(us.unitig_len(1)) == 10
        np.testing.assert_array_equal(us.pos_to_id(np.arange(10)), 0)
        np.testing.assert_array_equal(us.pos_to_id(np.arange(10, 20)), 1)
        assert us.total_len == 20
        assert us.n_kmers == 8

    def test_is_valid_useq_pos(self, tiny_spt):
        us = tiny_spt.unitigs
        want = [p <= 3 or 10 <= p <= 13 for p in range(20)]
        np.testing.assert_array_equal(us.is_valid_useq_pos(np.arange(20)), want)


class TestTinySPT:
    def test_goldens(self, tiny_spt):
        spt = tiny_spt
        assert spt.num_refs == 2
        assert spt.n_total_occs == 4
        assert spt.ref_names[0] == "Reference:1_Sequence:I"
        assert spt.ref_lens[0] == 24
        assert spt.get_occ(0, 0) == (0, 3, 1)
        assert spt.get_occ(0, 1) == (1, 11, 0)
        assert spt.get_occ(1, 0) == (0, 14, 0)
        assert spt.get_occ(1, 1) == (1, 0, 1)

    def test_encodings_agree(self, tiny_spt):
        dense = tiny_spt.dense_table()
        piscem = tiny_spt.piscem_table()
        for uid in range(tiny_spt.unitigs.n_unitigs):
            for a, b in zip(dense.occs(uid), piscem.occs(uid)):
                np.testing.assert_array_equal(a, b)


class TestPiscemOccEncoding:
    def test_roundtrip(self):
        # reference src/spt_compact.rs:505-520
        from mazu_tpu.index.unitig_table import decode_piscem, encode_piscem

        word = encode_piscem(0, 1, 0, ref_shift=3)
        assert int(word) == 0b010
        r, p, o = decode_piscem(word, 3, 0b11, np)
        assert (int(r), int(p), int(o)) == (0, 1, 0)


class TestBuildTiny:
    def test_pfhash_and_validate(self, tiny_spt):
        k2u = PFHash.from_unitig_set(tiny_spt.unitigs)
        validate_k2u_self(k2u)
        idx = ModIndex(k2u, tiny_spt.dense_table(), tiny_spt.ref_seq_collection())
        validate_fasta(idx, TINY_FA)
        idx2 = ModIndex(k2u, tiny_spt.piscem_table(), tiny_spt.ref_seq_collection())
        validate_fasta(idx2, TINY_FA)


class TestBuildYeast:
    def test_pufferfish_dense_from_cf(self, yeast_spt):
        assert yeast_spt.unitigs.n_unitigs == 471
        assert yeast_spt.unitigs.n_kmers == 1071346
        k2u = PFHash.from_unitig_set(yeast_spt.unitigs)
        idx = ModIndex(k2u, yeast_spt.dense_table(), yeast_spt.ref_seq_collection())
        validate_fasta(idx, YEAST_FA)
