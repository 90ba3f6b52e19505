"""K-mer word math tests (revcomp, canonicalization, equivalency, minimizers)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mazu_tpu import MATCH_IDENTITY, MATCH_NONE, MATCH_TWIN
from mazu_tpu.kmer import (
    canonical_minimizer_batch,
    canonicalize,
    kmer_from_str,
    kmer_to_str,
    revcomp,
    word_equivalency,
)

RNG = np.random.default_rng(1)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc_str(s):
    return "".join(COMP[c] for c in reversed(s))


class TestRevcomp:
    @pytest.mark.parametrize("k", [1, 3, 7, 15, 16, 31])
    def test_matches_string_rc(self, k):
        for _ in range(20):
            s = "".join(RNG.choice(list("ACGT"), k))
            w = kmer_from_str(s)
            assert kmer_to_str(revcomp(np.uint64(w), k), k) == rc_str(s)

    def test_involution(self):
        k = 31
        ws = RNG.integers(0, 1 << 62, 100, dtype=np.uint64)
        np.testing.assert_array_equal(revcomp(revcomp(ws, k), k), ws)

    def test_jnp_matches_np(self):
        k = 21
        ws = RNG.integers(0, 1 << (2 * k), 64, dtype=np.uint64)
        np.testing.assert_array_equal(
            np.asarray(revcomp(jnp.asarray(ws), k)), revcomp(ws, k)
        )


class TestCanonical:
    def test_canonical_is_min(self):
        k = 9
        ws = RNG.integers(0, 1 << (2 * k), 100, dtype=np.uint64)
        canon, is_fw, rc = canonicalize(ws, k)
        np.testing.assert_array_equal(canon, np.minimum(ws, rc))
        np.testing.assert_array_equal(is_fw, ws <= rc)

    def test_equivalency(self):
        k = 7
        s = "CACACAC"
        fw = np.uint64(kmer_from_str(s))
        rc = revcomp(fw, k)
        assert word_equivalency(fw, rc, fw, k) == MATCH_IDENTITY
        assert word_equivalency(fw, rc, rc, k) == MATCH_TWIN
        other = np.uint64(kmer_from_str("AAAAAAA"))
        assert word_equivalency(fw, rc, other, k) == MATCH_NONE


class TestMinimizer:
    def brute(self, word, k, w, seed=0):
        from mazu_tpu.kmer import mix64

        canon, is_fw, _ = canonicalize(np.uint64(word), k)
        canon = int(canon)
        best = None
        for j in range(k - w + 1):
            mv = (canon >> (2 * j)) & ((1 << (2 * w)) - 1)
            sc = int(mix64(np.uint64(mv), np.uint64(seed)))
            if best is None or sc < best[0]:
                best = (sc, mv, j)
        _, mv, j = best
        off = j if is_fw else k - w - j
        return mv, off

    @pytest.mark.parametrize("k,w", [(7, 3), (7, 5), (7, 7), (31, 15), (31, 31)])
    def test_matches_brute(self, k, w):
        ws = RNG.integers(0, 1 << min(63, 2 * k), 200, dtype=np.uint64) & np.uint64(
            (1 << (2 * k)) - 1
        )
        mv, off, is_fw, canon = canonical_minimizer_batch(np, ws, k, w)
        for i in range(len(ws)):
            bmv, boff = self.brute(ws[i], k, w)
            assert int(mv[i]) == bmv
            assert int(off[i]) == boff

    def test_fw_rc_consistency(self):
        """The scheme's correctness invariant: for a k-mer at position p of a
        sequence, the stored occurrence position p + offset(fw_window) is
        probed by a query of the same k-mer in either orientation via
        {mm_pos - offset, mm_pos - (k - offset - w)}."""
        k, w = 31, 15
        ws = RNG.integers(0, 1 << 62, 200, dtype=np.uint64)
        mv_f, off_f, _, _ = canonical_minimizer_batch(np, ws, k, w)
        rcs = revcomp(ws, k)
        mv_r, off_r, _, _ = canonical_minimizer_batch(np, rcs, k, w)
        # same minimizer value either way
        np.testing.assert_array_equal(mv_f, mv_r)
        # offsets are mutual complements: off_r == k - w - off_f
        np.testing.assert_array_equal(off_r, (k - w) - off_f)

    def test_jnp_matches_np(self):
        k, w = 31, 15
        ws = RNG.integers(0, 1 << 62, 64, dtype=np.uint64)
        a = canonical_minimizer_batch(np, ws, k, w)
        b = canonical_minimizer_batch(jnp, jnp.asarray(ws), k, w)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.parametrize("k,w", [(31, 17), (31, 19), (31, 21)])
    def test_wide_w_native_parity(self, k, w):
        """w > 16 under mix32 ordering: the score is the LOW 32 bits of the
        w-mer in every implementation (device/NumPy astype(u32) == native
        (uint32_t) cast). Gbp-scale builds need w >= 17 so bucket depth
        tracks genome size; this pins the batch path == the native build
        scan bit-for-bit."""
        from mazu_tpu.bits.seqvector import SeqVector
        from mazu_tpu.io.native import have_native, minimizer_scan32

        if not have_native():
            pytest.skip("native lib unavailable")
        n = 4096
        codes = RNG.integers(0, 4, size=n + k, dtype=np.uint8)
        sv = SeqVector.from_codes(codes)
        kpos = np.arange(n, dtype=np.int64)
        mm_n, off_n, isfw_n = minimizer_scan32(sv.words, kpos, k, w, 0)
        lo = codes.astype(np.uint64)
        ws = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # LSB-first 2-bit pack of each window
            ws |= lo[j : j + n] << np.uint64(2 * j)
        mm_b, off_b, isfw_b, _ = canonical_minimizer_batch(
            np, ws, k, w, 0, ordering="mix32"
        )
        np.testing.assert_array_equal(mm_n, mm_b)
        np.testing.assert_array_equal(off_n, off_b)
        np.testing.assert_array_equal(isfw_n, isfw_b)
