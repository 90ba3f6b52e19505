"""WM-backed occurrence table (U2Pos compression test-bed, reference
README highlight 4): exact decode parity vs the piscem packed table and
full-query equality through ModIndex."""

import os

import numpy as np
import pytest

from mazu_tpu.index.modindex import ModIndex, get_ref_pos_padded
from mazu_tpu.index.spt import SPT
from mazu_tpu.index.unitig_table import WMUnitigTable
from mazu_tpu.io.cuttlefish import CfFiles
from mazu_tpu.kphf.sshash import SSHash

from conftest import TEST_DATA

TINY = os.path.join(TEST_DATA, "cf", "tiny", "tiny")
YEAST = os.path.join(TEST_DATA, "cf", "yeast_chr7", "yeast_chr7")


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


class TestWMTable:
    def test_tiny_decode_parity(self, tiny_spt):
        pt = tiny_spt.piscem_table()
        wt = WMUnitigTable.from_piscem(pt)
        assert wt.n_unitigs == pt.n_unitigs
        assert wt.max_occs() == pt.max_occs()
        for uid in range(pt.n_unitigs):
            for a, b in zip(pt.occs(uid), wt.occs(uid)):
                np.testing.assert_array_equal(a, b)

    def test_yeast_decode_parity(self, yeast_spt):
        pt = yeast_spt.piscem_table()
        wt = WMUnitigTable.from_piscem(pt)
        n = pt.n_total_occs
        idx = np.arange(n)
        want = pt.ctable.get(idx)
        got = wt._words(idx)
        np.testing.assert_array_equal(got, want)

    def test_unitig_slice_rank(self, yeast_spt):
        pt = yeast_spt.piscem_table()
        wt = WMUnitigTable.from_piscem(pt)
        # pick the unitig with the most occurrences; its slice must count
        # plane symbols exactly like the raw window
        uid = int(np.argmax(pt.offsets[1:] - pt.offsets[:-1]))
        s, e = int(pt.offsets[uid]), int(pt.offsets[uid + 1])
        plane0 = (pt.ctable.get(np.arange(s, e)) & np.uint64(0xFF)).astype(np.uint8)
        sl = wt.unitig_slice(uid, plane=0)
        assert len(sl) == e - s
        for a in np.unique(plane0)[:4]:
            assert int(sl.rank(int(a), len(sl))) == int((plane0 == a).sum())

    def test_full_query_equality(self, yeast_spt):
        import jax
        import jax.numpy as jnp

        from mazu_tpu.containers.refseq import RefSeqCollection

        k2u = SSHash.from_unitig_set(yeast_spt.unitigs, w=15, skew_param=4, engine="fast32")
        refs = RefSeqCollection.from_fasta(YEAST + ".fa")
        pt = yeast_spt.piscem_table()
        wt = WMUnitigTable.from_piscem(pt)
        idx_p = ModIndex(k2u, pt, refs)
        idx_w = ModIndex(k2u, wt, refs)
        kms = refs.ref_kmers(0, k2u.k)[:4096]
        mo = max(1, pt.max_occs())
        a = get_ref_pos_padded(idx_p.device_arrays(), kms, np, mo)
        b = get_ref_pos_padded(idx_w.device_arrays(), kms, np, mo)
        for key in ("unitig_id", "pos", "mt", "n_occs"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
        v = a["valid"]
        np.testing.assert_array_equal(v, b["valid"])
        for key in ("ref_id", "ref_pos", "orient"):
            np.testing.assert_array_equal(
                np.where(v, a[key], 0), np.where(v, b[key], 0), err_msg=key
            )
        # device path agrees with host
        dw = jax.device_put(idx_w.device_arrays())
        dev = jax.jit(lambda w_: get_ref_pos_padded(dw, w_, jnp, mo))(
            jnp.asarray(kms[:512])
        )
        for key in ("unitig_id", "mt", "ref_id", "ref_pos", "valid"):
            np.testing.assert_array_equal(
                np.asarray(dev[key]), a[key][:512], err_msg=key
            )

    def test_space_accounting(self, yeast_spt):
        pt = yeast_spt.piscem_table()
        wt = WMUnitigTable.from_piscem(pt)
        assert wt.num_bits() > 0
        # record the experiment's answer: WM planes cost at most ~2.5x the
        # minimal packing (rank blocks + plane rounding), in exchange for
        # in-window symbol rank/select
        assert wt.num_bits() < 2.5 * (pt.ctable.num_bits() + 64 * len(pt.offsets))
