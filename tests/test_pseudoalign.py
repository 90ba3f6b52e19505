"""Pseudo-alignment (color-set intersection over read k-mers): exactness
vs a scalar host oracle built on the projection path, on the reserved
color_classes transcriptome fixture."""

import os

import numpy as np
import pytest

from mazu_tpu.index.piscem_index import piscem_index_from_cf_prefix
from mazu_tpu.index.pseudoalign import PseudoAligner
from mazu_tpu.index.streaming import kmerize_reads
from mazu_tpu.io.fasta import read_fasta

from conftest import TEST_DATA

CC_TXOME = os.path.join(TEST_DATA, "color_classes", "small_txome", "small_txome")
COMP = str.maketrans("ACGT", "TGCA")


@pytest.fixture(scope="module")
def txome():
    if not os.path.exists(CC_TXOME + ".cf_seg"):
        pytest.skip("fixture missing")
    idx = piscem_index_from_cf_prefix(CC_TXOME, w=11, skew_param=4)
    refs = list(read_fasta(CC_TXOME + ".fa"))
    return idx, refs


def _oracle(idx, reads):
    """Scalar oracle: intersect per-k-mer distinct ref-id sets from the
    eager projection path."""
    out = []
    k = idx.k
    kmat, valid, _ = kmerize_reads(reads, k)
    for i in range(len(reads)):
        words = kmat[i][valid[i]]
        hits = idx.get_ref_pos_eager(words)
        sets = [set(r for r, _p, _o in h) for h in hits if h is not None]
        inter = sorted(set.intersection(*sets)) if sets else []
        out.append((inter, len(sets), len(words)))
    return out


def test_pseudoalign_matches_oracle(txome):
    idx, refs = txome
    rng = np.random.default_rng(11)
    reads = []
    for ri in rng.integers(0, len(refs), 40):
        seq = refs[int(ri)][1]
        ln = int(rng.integers(idx.k + 5, min(120, len(seq))))
        s = int(rng.integers(0, len(seq) - ln + 1))
        r = seq[s : s + ln]
        if rng.random() < 0.5:
            r = r.translate(COMP)[::-1]
        reads.append(r)
    reads.append("GATTACA" * 18)  # foreign: zero hits -> empty set
    reads[5] = reads[5][:12] + "N" + reads[5][13:]
    pa = PseudoAligner(idx)
    got = pa.map_reads(reads)
    want = _oracle(idx, reads)
    for i, ((g_refs, g_hit, g_k), (w_refs, w_hit, w_k)) in enumerate(zip(got, want)):
        assert g_refs.tolist() == w_refs, i
        assert (g_hit, g_k) == (w_hit, w_k), i
    # host (numpy) path == jitted path
    pa_np = PseudoAligner(idx, cc=pa.cc, use_jit=False)
    got_np = pa_np.map_reads(reads)
    for a, b in zip(got, got_np):
        assert a[0].tolist() == b[0].tolist() and a[1:] == b[1:]


def test_pseudoalign_source_ref_contained(txome):
    idx, refs = txome
    pa = PseudoAligner(idx)
    rng = np.random.default_rng(3)
    reads, srcs = [], []
    for ri in range(len(refs)):
        seq = refs[ri][1]
        if len(seq) < idx.k + 20:
            continue
        s = int(rng.integers(0, len(seq) - idx.k - 19))
        reads.append(seq[s : s + idx.k + 19])
        srcs.append(ri)
    got = pa.map_reads(reads)
    for (g_refs, g_hit, g_k), ri in zip(got, srcs):
        assert g_hit == g_k  # every k-mer of an indexed read hits
        assert ri in g_refs.tolist()


def test_pseudoalign_union_policy(txome):
    idx, refs = txome
    rng = np.random.default_rng(21)
    # chimeric reads: halves from two different transcripts -> intersection
    # often empty, union covers both sources
    reads = []
    pairs = []
    for _ in range(12):
        a, b = rng.integers(0, len(refs), 2)
        sa, sb = refs[int(a)][1], refs[int(b)][1]
        if len(sa) < 70 or len(sb) < 70:
            continue
        reads.append(sa[:60] + sb[:60])
        pairs.append((int(a), int(b)))
    inter = PseudoAligner(idx, policy="intersect")
    union = PseudoAligner(idx, cc=inter.cc, policy="union")
    gi = inter.map_reads(reads)
    gu = union.map_reads(reads)
    # oracle
    k = idx.k
    kmat, valid, _ = kmerize_reads(reads, k)
    for i in range(len(reads)):
        hits = idx.get_ref_pos_eager(kmat[i][valid[i]])
        sets = [set(r for r, _p, _o in h) for h in hits if h is not None]
        assert gi[i][0].tolist() == (sorted(set.intersection(*sets)) if sets else [])
        assert gu[i][0].tolist() == (sorted(set.union(*sets)) if sets else [])
        a, b = pairs[i]
        assert a in gu[i][0].tolist() and b in gu[i][0].tolist()
    # numpy path parity for union too
    un = PseudoAligner(idx, cc=inter.cc, policy="union", use_jit=False)
    for x, y in zip(gu, un.map_reads(reads)):
        assert x[0].tolist() == y[0].tolist() and x[1:] == y[1:]


@pytest.mark.slow
def test_pseudoalign_threshold_policy(txome):
    idx, refs = txome
    rng = np.random.default_rng(33)
    reads = []
    for _ in range(10):
        a, b = rng.integers(0, len(refs), 2)
        sa, sb = refs[int(a)][1], refs[int(b)][1]
        if len(sa) < 100 or len(sb) < 50:
            continue
        # 3:1 chimeric mix: tau=0.5 should keep the dominant source only
        reads.append(sa[:90] + sb[:50])
    reads.append(refs[0][1][:80])
    inter = PseudoAligner(idx, policy="intersect")
    cc = inter.cc
    # tau=1.0 == intersect; tiny tau == union
    t1 = PseudoAligner(idx, cc=cc, policy="threshold", tau=1.0)
    te = PseudoAligner(idx, cc=cc, policy="threshold", tau=1e-9)
    union = PseudoAligner(idx, cc=cc, policy="union")
    gi, g1 = inter.map_reads(reads), t1.map_reads(reads)
    gu, ge = union.map_reads(reads), te.map_reads(reads)
    for a, b in zip(gi, g1):
        assert a[0].tolist() == b[0].tolist() and a[1:] == b[1:]
    for a, b in zip(gu, ge):
        assert a[0].tolist() == b[0].tolist() and a[1:] == b[1:]
    # mid tau vs scalar oracle
    import math

    tm = PseudoAligner(idx, cc=cc, policy="threshold", tau=0.5)
    gm = tm.map_reads(reads)
    kmat, valid, _ = kmerize_reads(reads, idx.k)
    for i in range(len(reads)):
        hits = idx.get_ref_pos_eager(kmat[i][valid[i]])
        sets = [set(r for r, _p, _o in h) for h in hits if h is not None]
        if not sets:
            assert gm[i][0].size == 0
            continue
        need = max(1, math.ceil(0.5 * len(sets)))
        from collections import Counter

        cnt = Counter()
        for s in sets:
            cnt.update(s)
        want = sorted(r for r, n in cnt.items() if n >= need)
        assert gm[i][0].tolist() == want, i
    # numpy path parity
    tn = PseudoAligner(idx, cc=cc, policy="threshold", tau=0.5, use_jit=False)
    for x, y in zip(gm, tn.map_reads(reads)):
        assert x[0].tolist() == y[0].tolist() and x[1:] == y[1:]
    # device bit-sliced counting == host per-class counting (same reads)
    th = PseudoAligner(idx, cc=cc, policy="threshold", tau=0.5, threshold_on="host")
    for x, y in zip(gm, th.map_reads(reads)):
        assert x[0].tolist() == y[0].tolist() and x[1:] == y[1:]


def test_pseudoalign_threshold_mid_tau_fast(txome):
    """Fast-lane threshold coverage (the exhaustive tau grids are marked
    slow — each PseudoAligner bakes tau into a fresh jit compile): ONE
    device threshold aligner at tau=0.5 checked against the scalar
    counting oracle, the numpy path, and host-side counting."""
    import math
    from collections import Counter

    idx, refs = txome
    rng = np.random.default_rng(33)
    reads = []
    for _ in range(6):
        a, b = rng.integers(0, len(refs), 2)
        sa, sb = refs[int(a)][1], refs[int(b)][1]
        if len(sa) < 100 or len(sb) < 50:
            continue
        reads.append(sa[:90] + sb[:50])
    reads.append(refs[0][1][:80])
    reads.append("GATTACA" * 12)  # zero hits
    base = PseudoAligner(idx, policy="intersect")
    tm = PseudoAligner(idx, cc=base.cc, policy="threshold", tau=0.5)
    gm = tm.map_reads(reads)
    kmat, valid, _ = kmerize_reads(reads, idx.k)
    for i in range(len(reads)):
        hits = idx.get_ref_pos_eager(kmat[i][valid[i]])
        sets = [set(r for r, _p, _o in h) for h in hits if h is not None]
        if not sets:
            assert gm[i][0].size == 0
            continue
        need = max(1, math.ceil(0.5 * len(sets)))
        cnt = Counter()
        for s in sets:
            cnt.update(s)
        want = sorted(r for r, n in cnt.items() if n >= need)
        assert gm[i][0].tolist() == want, i
    # numpy path + host-side counting parity (both cheap: no new jit)
    tn = PseudoAligner(idx, cc=base.cc, policy="threshold", tau=0.5, use_jit=False)
    th = PseudoAligner(
        idx, cc=base.cc, policy="threshold", tau=0.5, threshold_on="host"
    )
    for x, y, z in zip(gm, tn.map_reads(reads), th.map_reads(reads)):
        assert x[0].tolist() == y[0].tolist() and x[1:] == y[1:]
        assert x[0].tolist() == z[0].tolist() and x[1:] == z[1:]


@pytest.mark.slow
def test_pseudoalign_threshold_device_host_tau_fuzz(txome):
    """Device bit-sliced counting must agree with the host counting loop
    for arbitrary taus (both derive need from the same tau_q32 integer)."""
    idx, refs = txome
    rng = np.random.default_rng(77)
    reads = []
    for _ in range(8):
        a, b = rng.integers(0, len(refs), 2)
        sa, sb = refs[int(a)][1], refs[int(b)][1]
        ln_a = min(len(sa), int(rng.integers(idx.k, 90)))
        reads.append(sa[:ln_a] + sb[: min(len(sb), 40)])
    reads.append("GATTACA" * 12)  # zero hits
    base = PseudoAligner(idx, policy="intersect")
    for tau in (0.2, 1 / 3, 0.7, 0.9999, float(rng.random() * 0.98 + 0.01)):
        td = PseudoAligner(idx, cc=base.cc, policy="threshold", tau=tau)
        th = PseudoAligner(
            idx, cc=base.cc, policy="threshold", tau=tau, threshold_on="host"
        )
        for i, (x, y) in enumerate(zip(td.map_reads(reads), th.map_reads(reads))):
            assert x[0].tolist() == y[0].tolist() and x[1:] == y[1:], (tau, i)
