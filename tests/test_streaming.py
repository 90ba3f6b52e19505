"""Streaming (k-mer cache) tests: exact equality with the cold path and
warm-rate sanity (reference src/index/caching.rs semantics, batched)."""

import os

import numpy as np
import pytest

from mazu_tpu.index.modindex import k2u_batch
from mazu_tpu.index.piscem_index import piscem_index_from_cf_prefix
from mazu_tpu.index.streaming import (
    StreamingIndex,
    kmerize_reads,
    validate_fasta_streaming,
)
from mazu_tpu.io.fasta import read_fasta

from conftest import TEST_DATA

TINY = os.path.join(TEST_DATA, "cf", "tiny", "tiny")
YEAST = os.path.join(TEST_DATA, "cf", "yeast_chr7", "yeast_chr7")

COMP = str.maketrans("ACGT", "TGCA")


@pytest.fixture(scope="module")
def tiny_index():
    if not os.path.exists(TINY + ".cf_seg"):
        pytest.skip("tiny cf fixture missing")
    return piscem_index_from_cf_prefix(TINY, w=3, skew_param=2)


def test_tiny_streaming_validate(tiny_index):
    validate_fasta_streaming(tiny_index, TINY + ".fa")


def test_streaming_equals_cold_mixed_strands(tiny_index):
    idx = tiny_index
    refs = [seq for _, seq in read_fasta(TINY + ".fa")]
    reads = []
    for seq in refs:
        reads.append(seq)
        reads.append(seq.translate(COMP)[::-1])
    si = StreamingIndex(idx, use_jit=False)
    kms, valid, _ = kmerize_reads(reads, idx.k)
    out = si.k2u_reads(kms, valid)
    cold = k2u_batch(idx.device_arrays(), kms.reshape(-1), np)
    v = valid.reshape(-1)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(
            out[key].reshape(-1)[v], np.asarray(cold[key]).reshape(-1)[v], err_msg=key
        )


@pytest.mark.slow
def test_yeast_streaming_reads():
    if not os.path.exists(YEAST + ".cf_seg"):
        pytest.skip("yeast cf fixture missing")
    idx = piscem_index_from_cf_prefix(YEAST, w=15, skew_param=32)
    rng = np.random.default_rng(0)
    seq = next(read_fasta(YEAST + ".fa"))[1]
    reads = [seq[s : s + 150] for s in rng.integers(0, len(seq) - 150, 256)]
    reads = [r if i % 2 else r.translate(COMP)[::-1] for i, r in enumerate(reads)]
    si = StreamingIndex(idx)
    kms, valid, _ = kmerize_reads(reads, idx.k)
    out = si.k2u_reads(kms, valid)
    cold = k2u_batch(idx.device_arrays(), kms.reshape(-1), np)
    v = valid.reshape(-1)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(
            out[key].reshape(-1)[v], np.asarray(cold[key]).reshape(-1)[v], err_msg=key
        )
    # bidirectional warm check keeps mixed-strand reads warm
    assert si.last_cold_fraction < 0.05


def test_streaming_with_direct_engine():
    if not os.path.exists(TINY + ".cf_seg"):
        pytest.skip("tiny cf fixture missing")
    idx = piscem_index_from_cf_prefix(TINY, w=3, skew_param=2, engine="direct")
    validate_fasta_streaming(idx, TINY + ".fa")


def test_flat_equals_host_loop():
    """mode="flat" (one flat cold kernel + derived warm flags) returns
    bit-identical results AND cold accounting vs the sequential host loop —
    the k-mer-uniqueness argument in the module docstring, checked on real
    mixed-strand reads with a non-ACGT restart."""
    if not os.path.exists(YEAST + ".cf_seg"):
        pytest.skip("yeast cf fixture missing")
    idx = piscem_index_from_cf_prefix(YEAST, w=15, skew_param=32)
    rng = np.random.default_rng(7)
    seq = next(read_fasta(YEAST + ".fa"))[1]
    reads = [seq[s : s + 120] for s in rng.integers(0, len(seq) - 120, 64)]
    reads = [r if i % 2 else r.translate(COMP)[::-1] for i, r in enumerate(reads)]
    reads[3] = reads[3][:50] + "N" + reads[3][51:]  # non-ACGT restart
    reads[9] = "GATTACA" * 17  # read absent from the reference: all-miss lanes
    kms, valid, _ = kmerize_reads(reads, idx.k)
    host = StreamingIndex(idx)
    flat = StreamingIndex(idx, mode="flat")
    a = host.k2u_reads(kms, valid)
    b = flat.k2u_reads(kms, valid)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert host.last_cold_fraction == flat.last_cold_fraction
    assert 0 < flat.last_cold_fraction < 0.10

    ra = host.get_ref_pos_reads(kms, valid)
    rb = flat.get_ref_pos_reads(kms, valid)
    for key in ("ref_id", "ref_pos", "orient", "valid", "n_occs"):
        np.testing.assert_array_equal(ra[key], rb[key], err_msg=key)


def test_device_scan_equals_host_loop():
    """device_scan=True (one jitted lax.scan, no per-column host round
    trips) returns bit-identical results and cold accounting."""
    if not os.path.exists(YEAST + ".cf_seg"):
        pytest.skip("yeast cf fixture missing")
    idx = piscem_index_from_cf_prefix(YEAST, w=15, skew_param=32)
    rng = np.random.default_rng(3)
    seq = next(read_fasta(YEAST + ".fa"))[1]
    reads = [seq[s : s + 120] for s in rng.integers(0, len(seq) - 120, 64)]
    reads = [r if i % 2 else r.translate(COMP)[::-1] for i, r in enumerate(reads)]
    reads[5] = reads[5][:40] + "N" + reads[5][41:]  # non-ACGT restart
    kms, valid, _ = kmerize_reads(reads, idx.k)
    host = StreamingIndex(idx)
    dev = StreamingIndex(idx, device_scan=True)
    a = host.k2u_reads(kms, valid)
    b = dev.k2u_reads(kms, valid)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert host.last_cold_fraction == dev.last_cold_fraction

    # full projection path through the scan
    ra = host.get_ref_pos_reads(kms, valid)
    rb = dev.get_ref_pos_reads(kms, valid)
    for key in ("ref_id", "ref_pos", "orient", "valid", "n_occs"):
        np.testing.assert_array_equal(ra[key], rb[key], err_msg=key)


def test_packed_reads_kmerize_device(tiny_index):
    """pack_reads + kmerize_device == host kmerize_reads bit-for-bit, on
    variable-length mixed-strand reads with non-ACGT bases and an empty-ish
    short read."""
    import jax
    import jax.numpy as jnp

    from mazu_tpu.io.reads import kmerize_device, pack_reads

    k = tiny_index.k
    refs = [seq for _, seq in read_fasta(TINY + ".fa")]
    rng = np.random.default_rng(5)
    reads = []
    for seq in refs:
        for _ in range(4):
            ln = int(rng.integers(k, max(len(seq), k + 1)))
            s = int(rng.integers(0, max(len(seq) - ln, 1)))
            r = seq[s : s + ln]
            if rng.random() < 0.5:
                r = r.translate(COMP)[::-1]
            reads.append(r)
    reads[1] = reads[1][: k - 2]  # shorter than k: zero valid k-mers
    reads[2] = reads[2][:5] + "N" + reads[2][6:]
    reads[4] = "NRN" + reads[4][3:]  # IUPAC garbage too
    want_kms, want_valid, _ = kmerize_reads(reads, k)
    packed = pack_reads(reads, k)
    got_kms, got_valid = jax.jit(lambda p: kmerize_device(p, jnp))(
        jax.device_put(packed)
    )
    np.testing.assert_array_equal(np.asarray(got_valid), want_valid)
    np.testing.assert_array_equal(np.asarray(got_kms), want_kms)


def test_k2u_reads_packed_equals_host(tiny_index):
    from mazu_tpu.io.reads import pack_reads

    refs = [seq for _, seq in read_fasta(TINY + ".fa")]
    reads = []
    for seq in refs:
        reads.append(seq)
        reads.append(seq.translate(COMP)[::-1])
    reads.append("GATTACA" * 12)  # foreign
    kms, valid, _ = kmerize_reads(reads, tiny_index.k)
    host = StreamingIndex(tiny_index, use_jit=False)
    flat = StreamingIndex(tiny_index, mode="flat")
    a = host.k2u_reads(kms, valid)
    b = flat.k2u_reads_packed(pack_reads(reads, tiny_index.k))
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    assert host.last_cold_fraction == flat.last_cold_fraction


def test_pack_fastq_native_parity(tmp_path):
    """pack_fastq (fused native FASTQ parse+pack) == read_fastq + pack_reads
    byte-for-byte on the full pytree: varying lengths, multi-line records,
    non-ACGT/lowercase bases, gzip, odd record count (bad-mask padding),
    and no trailing newline. Malformed files raise via the Python reader."""
    import gzip

    import pytest

    from mazu_tpu.err import InvalidData
    from mazu_tpu.io.fastq import read_fastq
    from mazu_tpu.io.reads import pack_fastq, pack_reads

    rng = np.random.default_rng(3)
    recs = []
    for i in range(33):
        ln = int(rng.integers(40, 180))
        s = "".join(rng.choice(list("ACGT"), ln))
        if i % 5 == 0:
            s = s[:7] + "N" + s[8:]
        if i % 7 == 0:
            s = s.lower()
        q = "I" * ln
        if i % 3 == 0:
            m = ln // 2
            recs.append(f"@r{i} x\n{s[:m]}\n{s[m:]}\n+\n{q[:m]}\n{q[m:]}\n")
        else:
            recs.append(f"@r{i}\n{s}\n+anything\n{q}\n")
    txt = "".join(recs).rstrip("\n")  # no trailing newline at EOF
    k = 31
    for suffix, data in ((".fastq", txt.encode()), (".fastq.gz", gzip.compress(txt.encode()))):
        p = str(tmp_path / ("reads" + suffix))
        with open(p, "wb") as f:
            f.write(data)
        a = pack_fastq(p, k)
        b = pack_reads([s for _, s in read_fastq(p)], k)
        assert a["meta"] == b["meta"]
        for key in ("words", "lengths", "bad"):
            assert np.array_equal(a[key], b[key]), key

    bad = str(tmp_path / "bad.fastq")
    with open(bad, "w") as f:
        f.write("@r\nACGT\n+\nII\n")  # quality shorter than sequence
    with pytest.raises(InvalidData):
        pack_fastq(bad, k)


def test_pack_reads_edge_cases():
    """Degenerate inputs: empty list, read shorter than k, all-N read,
    empty read, N-split — kmerize_device must equal kmerize_reads."""
    from mazu_tpu.io.reads import kmerize_device, pack_reads

    k = 31
    for reads in (
        [],
        ["ACG"],
        ["N" * 40],
        ["ACGT" * 20, ""],
        ["ACGTNNNNACGTACGTACGTACGTACGTACGTACG"],
    ):
        p = pack_reads(reads, k)
        km_d, v_d = kmerize_device(p, np)
        km_h, v_h, _ = kmerize_reads(reads, k)
        np.testing.assert_array_equal(v_d, v_h)
        np.testing.assert_array_equal(km_d, km_h)
