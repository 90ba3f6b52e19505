"""Unit tests for bit primitives, including the reference's golden examples
(Vigna 2013 Elias-Fano example, reference src/elias_fano.rs:147-156)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mazu_tpu.bits import (
    BitVector,
    EFVector,
    IntVector,
    SeqVector,
    bv_rank,
    bv_select,
    bv_get_bit,
    bv_read_window,
    ef_get,
    iv_get,
    sv_get_kmer,
)
from mazu_tpu.bits.elias_fano import EFNotMonotone


RNG = np.random.default_rng(0)


def random_bits(n, p=0.5):
    return RNG.random(n) < p


class TestBitVector:
    @pytest.mark.parametrize("n,p", [(1, 1.0), (64, 0.5), (65, 0.1), (1000, 0.9), (4096, 0.02)])
    def test_rank_select_roundtrip(self, n, p):
        bits = random_bits(n, p)
        if not bits.any():
            bits[0] = True
        bv = BitVector.from_bools(bits)
        ref_rank = np.concatenate([[0], np.cumsum(bits)])
        pos = np.arange(n + 1)
        np.testing.assert_array_equal(bv.rank(pos), ref_rank)
        ones = np.flatnonzero(bits)
        np.testing.assert_array_equal(bv.select(np.arange(len(ones))), ones)
        np.testing.assert_array_equal(bv.get_bit(np.arange(n)), bits)
        # device kernels agree
        d = bv.device_arrays()
        np.testing.assert_array_equal(np.asarray(bv_rank(d, jnp.asarray(pos), jnp)), ref_rank)
        np.testing.assert_array_equal(
            np.asarray(bv_select(d, jnp.arange(len(ones)), jnp)), ones
        )
        np.testing.assert_array_equal(
            np.asarray(bv_get_bit(d, jnp.arange(n), jnp)), bits
        )

    def test_from_set_positions(self):
        pos = np.array([0, 5, 63, 64, 130])
        bv = BitVector.from_set_positions(pos, 131)
        assert bv.count_ones() == 5
        np.testing.assert_array_equal(bv.select(np.arange(5)), pos)

    def test_read_window(self):
        bits = random_bits(300, 0.5)
        bv = BitVector.from_bools(bits)
        for width in (1, 7, 30, 58):
            for p in (0, 1, 63, 64, 100, 300 - width):
                want = 0
                for i in range(width):
                    want |= int(bits[p + i]) << i
                got = int(bv.read_window(p, width))
                assert got == want, (p, width)
                got_dev = int(np.asarray(bv_read_window(bv.device_arrays(), p, width, jnp)))
                assert got_dev == want


class TestIntVector:
    @pytest.mark.parametrize("width", [1, 3, 8, 17, 31, 33, 58])
    def test_pack_roundtrip(self, width):
        n = 257
        vals = RNG.integers(0, 1 << width, n, dtype=np.uint64)
        iv = IntVector.from_array(vals, width=width)
        assert iv.width == width
        np.testing.assert_array_equal(iv.to_array(), vals)
        d = iv.device_arrays()
        np.testing.assert_array_equal(
            np.asarray(iv_get(d, jnp.arange(n), jnp)), vals
        )

    def test_minimal_width(self):
        iv = IntVector.from_array(np.array([3, 2, 0, 1]))
        assert iv.width == 2
        np.testing.assert_array_equal(iv.to_array(), [3, 2, 0, 1])


class TestEliasFano:
    def test_vigna_fig1(self):
        xs = np.array([5, 8, 8, 15, 32], dtype=np.uint64)
        ef = EFVector.from_array(xs, u=32)
        np.testing.assert_array_equal(ef.to_array(), xs)
        d = ef.device_arrays()
        np.testing.assert_array_equal(
            np.asarray(ef_get(d, jnp.arange(5), jnp)), xs
        )

    def test_not_monotone(self):
        with pytest.raises(EFNotMonotone):
            EFVector.from_array(np.array([5, 8, 7, 15, 32]))

    @pytest.mark.parametrize("n,u", [(10, 100), (1000, 10**6), (1000, 1001), (5, 5)])
    def test_random(self, n, u):
        xs = np.sort(RNG.integers(0, u + 1, n).astype(np.uint64))
        ef = EFVector.from_array(xs)
        np.testing.assert_array_equal(ef.to_array(), xs)
        d = ef.device_arrays()
        np.testing.assert_array_equal(
            np.asarray(ef_get(d, jnp.arange(n), jnp)), xs
        )


class TestSeqVector:
    def test_pack_unpack(self):
        s = "CACACACCACCCTCAATACG"
        sv = SeqVector.from_str(s)
        assert len(sv) == len(s)
        assert sv.to_str() == s

    def test_get_kmer(self):
        s = "ACGTACGTACGTTTTGGGCCCAAATTTACGTACGAACCGGTT"
        sv = SeqVector.from_str(s)
        from mazu_tpu.kmer import kmer_from_str

        for k in (1, 7, 15, 31):
            for p in range(0, len(s) - k + 1, 3):
                want = kmer_from_str(s[p : p + k])
                assert int(sv.get_kmer_u64(p, k)) == want
                assert int(np.asarray(sv_get_kmer(sv.device_arrays(), p, jnp, k))) == want


class TestNativeHostLib:
    def test_parity_with_numpy(self):
        import ctypes

        from mazu_tpu.io import native
        from mazu_tpu.index.validate import windows_from_codes
        from mazu_tpu.kmer import revcomp, seq_to_codes

        if not native.have_native():
            pytest.skip("no toolchain")
        rng = np.random.default_rng(11)
        seq = "".join(rng.choice(list("ACGTNacgt"), 5000))
        codes = seq_to_codes(seq)
        np.testing.assert_array_equal(native.seq_to_codes(seq), codes)
        for k in (5, 31):
            p_n, w_n = native.kmerize(codes, k)
            p_p, w_p = windows_from_codes(codes, k)
            np.testing.assert_array_equal(p_n, p_p)
            np.testing.assert_array_equal(w_n, w_p)
        lib = native._load()
        rcs = w_n.copy()
        lib.revcomp_words(
            rcs.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(rcs)), ctypes.c_int(31)
        )
        np.testing.assert_array_equal(rcs, revcomp(w_n, 31))
