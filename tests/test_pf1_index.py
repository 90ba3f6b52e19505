"""End-to-end pf1 (pufferfish C++) DenseIndex parity tests.

Mirrors the reference's workhorse tests (src/pf1/dense_index.rs:99-329):
byte-parity loading + full validate_self on every bundled dense fixture.
"""

import os

import numpy as np
import pytest

from mazu_tpu.io.pf1_index import load_dense_index
from mazu_tpu.index.validate import validate_self
from mazu_tpu.kmer import kmer_from_str

from conftest import TEST_DATA

PF1 = os.path.join(TEST_DATA, "pf1")


def _load(name):
    p = os.path.join(PF1, name)
    if not os.path.isdir(p):
        pytest.skip(f"{name} missing")
    return load_dense_index(p)


@pytest.fixture(scope="module")
def tiny():
    return _load("tiny_index")


@pytest.fixture(scope="module")
def yeast():
    return _load("yeast_chr01_index")


class TestTiny:
    def test_structure(self, tiny):
        assert tiny.index_type == "PF1Dense"
        assert tiny.n_unitigs == 1
        assert tiny.n_kmers == 4
        assert tiny.k == 3

    def test_kmer_positions(self, tiny):
        # indexed string AAACCC (reference src/pf1/dense_index.rs:168-209)
        kms = np.array(
            [kmer_from_str(s) for s in ["AAA", "AAC", "ACC", "CCC"]], dtype=np.uint64
        )
        res = tiny.get_ref_pos_eager(kms)
        for i, hits in enumerate(res):
            assert hits == [(0, i, 1)]
        # reverse complements -> same positions, rc orientation
        from mazu_tpu.kmer import revcomp

        res = tiny.get_ref_pos_eager(revcomp(kms, 3))
        for i, hits in enumerate(res):
            assert hits == [(0, i, 0)]

    def test_misses(self, tiny):
        kms = np.array(
            [kmer_from_str(s) for s in ["TAT", "ATA", "ACT", "CTG", "CCT"]],
            dtype=np.uint64,
        )
        assert tiny.get_ref_pos_eager(kms) == [None] * 5

    def test_validate(self, tiny):
        validate_self(tiny)


@pytest.mark.parametrize(
    "name,n_unitigs",
    [
        ("tiny-rc_index", 1),
        ("tiny-multi-refs/tiny-multi-refs_index", 7),
        ("small_txome_index", 23),
        ("yeast-180_index", 1),
    ],
)
def test_validate_dense_fixture(name, n_unitigs):
    idx = _load(name)
    assert idx.n_unitigs == n_unitigs
    validate_self(idx)


class TestYeast:
    def test_structure(self, yeast):
        assert yeast.n_unitigs == 577
        assert yeast.n_kmers == 221918

    def test_validate(self, yeast):
        validate_self(yeast)

    def test_jit_query_matches_numpy(self, yeast):
        import jax.numpy as jnp

        from mazu_tpu.index.modindex import get_ref_pos_padded

        kms = yeast.refs.ref_kmers(0, yeast.k)[:4096]
        arrays, qf = yeast.make_query_fn()
        out_j = {k: np.asarray(v) for k, v in qf(jnp.asarray(kms)).items()}
        out_n = get_ref_pos_padded(yeast.device_arrays(), kms, np, yeast.max_occs())
        for key in ("unitig_id", "pos", "mt", "ref_id", "ref_pos", "orient", "valid"):
            np.testing.assert_array_equal(out_j[key], out_n[key], err_msg=key)


class TestRefSeqAndContigIter:
    def test_tiny_refs_fasta(self):
        # reference src/refseq.rs:249-257
        from mazu_tpu.containers.refseq import RefSeqCollection

        p = os.path.join(PF1, "tiny-multi-refs", "tiny-multi-refs.fasta")
        if not os.path.exists(p):
            pytest.skip("fixture missing")
        refs = RefSeqCollection.from_fasta(p)
        assert refs.ref_seq_str(0) == "AGTGATGATAGTAGAGGTA"
        assert refs.ref_seq_str(1) == "AGTGACTGATAGTAGCAGGTA"

    def test_contig_iter(self):
        # reference src/refseq.rs:281-309
        idx = _load("tiny-multi-refs/tiny-multi-refs_index")
        ctgs0 = list(idx.iter_unitigs_on_ref(0))
        ctgs1 = list(idx.iter_unitigs_on_ref(1))
        assert [c["unitig_len"] for c in ctgs0] == [5, 8, 9, 8, 5]
        assert [c["unitig_id"] for c in ctgs0] == [0, 1, 2, 3, 4]
        assert [c["unitig_len"] for c in ctgs1] == [5, 9, 9, 9, 5]
        assert [c["unitig_id"] for c in ctgs1] == [0, 5, 2, 6, 4]

    def test_unitigs_on_ref_batched(self):
        """Occurrence-table inversion == the query-walk oracle, per entry
        (both refs of the multi-ref fixture + yeast chr01)."""
        import numpy as np

        for name, n_refs in (
            ("tiny-multi-refs/tiny-multi-refs_index", 2),
            ("yeast_chr01_index", 1),
        ):
            idx = _load(name)
            for ri in range(n_refs):
                walk = list(idx.iter_unitigs_on_ref(ri))
                b = idx.unitigs_on_ref(ri)
                assert len(walk) == len(b["unitig_id"])
                for key in ("unitig_id", "unitig_len", "pos", "o"):
                    assert (
                        np.array([c[key] for c in walk]) == b[key]
                    ).all(), (name, ri, key)

    def test_refseq_kmers(self):
        # reference src/refseq.rs:260-278
        idx = _load("tiny-multi-refs/tiny-multi-refs_index")
        from mazu_tpu.kmer import kmer_to_str

        kms = idx.refs.ref_kmers(1, idx.k)
        want = [
            "AGTGA", "GTGAC", "TGACT", "GACTG", "ACTGA", "CTGAT", "TGATA",
            "GATAG", "ATAGT", "TAGTA", "AGTAG", "GTAGC", "TAGCA", "AGCAG",
            "GCAGG", "CAGGT", "AGGTA",
        ]
        assert [kmer_to_str(w, idx.k) for w in kms] == want


class TestCSRProjection:
    def test_matches_padded(self, yeast):
        from mazu_tpu.index.modindex import get_ref_pos_csr, get_ref_pos_padded

        kms = yeast.refs.ref_kmers(0, yeast.k)[:2048]
        d = yeast.device_arrays()
        pad = get_ref_pos_padded(d, kms, np, yeast.max_occs())
        total = int(pad["n_occs"].sum())
        csr = get_ref_pos_csr(d, kms, np, budget=total + 7)
        assert int(csr["total"]) == total
        for q in range(0, len(kms), 97):
            for j in range(int(pad["n_occs"][q])):
                slot = int(csr["occ_start"][q]) + j
                assert csr["qid"][slot] == q
                assert csr["ref_id"][slot] == pad["ref_id"][q, j]
                assert csr["ref_pos"][slot] == pad["ref_pos"][q, j]
                assert csr["orient"][slot] == pad["orient"][q, j]

    def test_ref_names(self, yeast):
        assert len(yeast.ref_names) == yeast.n_refs


class TestErrors:
    def test_cf_token_parse_error(self):
        from mazu_tpu.err import CfSeqTokenParseError
        from mazu_tpu.io.cuttlefish import CfSeqToken

        with pytest.raises(CfSeqTokenParseError):
            CfSeqToken.parse("xyz")
        with pytest.raises(CfSeqTokenParseError):
            CfSeqToken.parse("Nabc")

    def test_ef_empty(self):
        from mazu_tpu.bits import EFVector
        from mazu_tpu.err import EFEmpty

        with pytest.raises(EFEmpty):
            EFVector.from_array(np.zeros(0, dtype=np.uint64))


class TestTwoPhaseFused:
    def test_fused_two_phase_matches_eager(self, yeast):
        from mazu_tpu.index.modindex import ModIndex
        from mazu_tpu.index.twophase import TwoPhaseIndexQuery
        from mazu_tpu.kmer import revcomp
        from mazu_tpu.kphf.sshash import SSHash

        ss = SSHash.from_unitig_set(
            yeast.k2u.unitigs, 15, skew_param=2, engine="direct"
        )
        idx = ModIndex(ss, yeast.u2pos, yeast.refs)
        kms = yeast.refs.ref_kmers(0, yeast.k)[:8000]
        rng = np.random.default_rng(1)
        flip = rng.random(len(kms)) < 0.5
        kms[flip] = revcomp(kms[flip], yeast.k)
        # include misses
        kms[:16] = rng.integers(0, 1 << 62, 16, dtype=np.uint64)
        tp = TwoPhaseIndexQuery(idx)
        got = tp.get_ref_pos_eager(kms)
        want = idx.get_ref_pos_eager(kms)
        miss_like = 0
        for a, b in zip(got, want):
            assert a == b
            miss_like += a is None
        assert miss_like >= 10  # the random k-mers mostly miss
