"""Wavelet matrix tests with the paper-figure goldens used by the reference
(src/wm.rs:393-601: Figure 4 of Claude–Navarro–Ordonez 2015)."""

import numpy as np
import pytest

from mazu_tpu.bits.wm import WaveletMatrix, wm_access, wm_rank, wm_select

FIG4 = np.array([4, 7, 6, 5, 3, 2, 1, 0, 2, 1, 4, 1, 7], dtype=np.uint8)


@pytest.fixture(scope="module")
def wm():
    return WaveletMatrix.build(FIG4, 8)


class TestBuildFig4:
    def test_height_len(self, wm):
        assert wm.n_levels == 3
        assert len(wm) == 13

    def test_levels(self, wm):
        ll0 = [1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 1]
        ll1 = [1, 1, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0, 1]
        ll2 = [1, 0, 1, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1]
        for l, want in enumerate([ll0, ll1, ll2]):
            np.testing.assert_array_equal(
                wm.levels[l].get_bit(np.arange(13)), np.array(want, dtype=bool)
            )

    def test_zeros_and_c(self, wm):
        np.testing.assert_array_equal(wm.zeros, [7, 7, 6])
        np.testing.assert_array_equal(wm.alpha_offsets, [0, 6, 3, 10, 1, 9, 5, 11])

    def test_heights(self):
        for alpha, h in [(8, 3), (7, 3), (9, 4), (256, 8)]:
            assert WaveletMatrix.build(np.array([1, 2, 3], np.uint8), alpha).n_levels == h


class TestQueries:
    def test_access(self, wm):
        np.testing.assert_array_equal(wm.access(np.arange(13)), FIG4)

    def test_rank(self, wm):
        for a in range(8):
            count = 0
            for i, s in enumerate(FIG4):
                assert wm.rank(a, i) == count
                if s == a:
                    count += 1
            assert wm.rank(a, 13) == count

    def test_select(self, wm):
        for a in range(8):
            occ = np.flatnonzero(FIG4 == a)
            if len(occ):
                np.testing.assert_array_equal(wm.select(a, np.arange(len(occ))), occ)

    def test_random_roundtrip(self):
        rng = np.random.default_rng(5)
        seq = rng.integers(0, 100, 2000).astype(np.uint8)
        wm = WaveletMatrix.build(seq, 100)
        np.testing.assert_array_equal(wm.access(np.arange(len(seq))), seq)
        for a in (0, 17, 99):
            want = np.concatenate([[0], np.cumsum(seq == a)])
            np.testing.assert_array_equal(wm.rank(a, np.arange(len(seq) + 1)), want)
            occ = np.flatnonzero(seq == a)
            np.testing.assert_array_equal(wm.select(a, np.arange(len(occ))), occ)

    def test_device_matches_host(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        seq = rng.integers(0, 16, 500).astype(np.uint8)
        wm = WaveletMatrix.build(seq, 16)
        d = wm.device_arrays()
        i = np.arange(len(seq))
        np.testing.assert_array_equal(np.asarray(wm_access(d, jnp.asarray(i), jnp)), seq)
        a = np.full(len(seq) + 1, 7)
        np.testing.assert_array_equal(
            np.asarray(wm_rank(d, jnp.asarray(a), jnp.arange(len(seq) + 1), jnp)),
            wm.rank(a, np.arange(len(seq) + 1)),
        )
        occ = np.flatnonzero(seq == 7)
        np.testing.assert_array_equal(
            np.asarray(
                wm_select(d, jnp.full(len(occ), 7), jnp.arange(len(occ)), jnp)
            ),
            occ,
        )


class TestSlice:
    """WaveletMatrixSlice — offset-window rank-difference view
    (reference src/wm.rs:13-44)."""

    def test_fig4_windows(self, wm):
        from mazu_tpu.bits.wm import WaveletMatrixSlice

        for start, end in [(0, 13), (3, 11), (5, 5), (2, 9)]:
            sl = WaveletMatrixSlice(wm, start, end)
            win = FIG4[start:end]
            assert len(sl) == end - start
            assert sl.is_empty() == (end == start)
            if len(win):
                np.testing.assert_array_equal(sl.access(np.arange(len(win))), win)
            for a in range(8):
                want_rank = np.concatenate([[0], np.cumsum(win == a)])
                np.testing.assert_array_equal(
                    sl.rank(a, np.arange(len(win) + 1)), want_rank
                )
                occ = np.flatnonzero(win == a)
                if len(occ):
                    np.testing.assert_array_equal(sl.select(a, np.arange(len(occ))), occ)

    def test_select_reference_semantics(self, wm):
        # reference select rebases by rank(a, start) and does NOT clamp to
        # the window: an occurrence past the window end is returned as-is,
        # None (-1) only when the whole sequence runs out of occurrences.
        from mazu_tpu.bits.wm import WaveletMatrixSlice

        sl = WaveletMatrixSlice(wm, 0, 2)  # window [4, 7]
        # 2nd occurrence of 7 in the whole sequence is at 12 -> past window
        assert sl.select(7, np.array([1]))[0] == 12
        # no 3rd occurrence of 7 anywhere -> None/-1
        assert sl.select(7, np.array([2]))[0] == -1

    def test_device_matches_host(self, wm):
        import jax.numpy as jnp

        from mazu_tpu.bits.wm import (
            WaveletMatrixSlice,
            wm_slice_access,
            wm_slice_rank,
            wm_slice_select,
        )

        d = wm.device_arrays()
        start, end = 3, 11
        sl = WaveletMatrixSlice(wm, start, end)
        n = end - start
        i = np.arange(n)
        st = np.full(n, start)
        np.testing.assert_array_equal(
            np.asarray(wm_slice_access(d, jnp.asarray(st), jnp.asarray(i), jnp)),
            sl.access(i),
        )
        for a in (1, 2, 7):
            aa = np.full(n + 1, a)
            st1 = np.full(n + 1, start)
            np.testing.assert_array_equal(
                np.asarray(
                    wm_slice_rank(d, jnp.asarray(aa), jnp.asarray(st1), jnp.arange(n + 1), jnp)
                ),
                sl.rank(a, np.arange(n + 1)),
            )
            rr = np.arange(3)
            np.testing.assert_array_equal(
                np.asarray(
                    wm_slice_select(
                        d, jnp.full(3, a), jnp.full(3, start), jnp.asarray(rr), jnp
                    )
                ),
                sl.select(a, rr),
            )
