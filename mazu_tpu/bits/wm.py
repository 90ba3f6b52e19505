"""Extended wavelet matrix over byte symbols (<= 8 levels).

Parity: reference src/wm.rs (Claude–Navarro–Ordonez 2015, extended WM with
the "C" alpha-offsets array). Reserved for occurrence-table compression
experiments, mirroring its role in the reference (built & tested, not yet
wired into an index type).

Build is host NumPy (per-level MSB bit planes + stable re-sort); access /
rank / select are batched device kernels walking the (static) level stack
with the BitVector rank/select primitives.
"""

from __future__ import annotations

import numpy as np

from ..pytree import meta
from .bitvector import BitVector, bv_get_bit, bv_rank, bv_select, _popcount

U64 = np.uint64
_NO_SYM = np.int64(-1)


class WaveletMatrix:
    def __init__(self, levels, zeros, alpha_offsets, length, alpha_size):
        self.levels: list[BitVector] = levels
        self.zeros = np.asarray(zeros, dtype=np.int64)
        self.alpha_offsets = np.asarray(alpha_offsets, dtype=np.int64)  # -1 == absent
        self.length = int(length)
        self.alpha_size = int(alpha_size)
        self.n_levels = len(levels)

    @classmethod
    def build(cls, seq: np.ndarray, alpha_size: int) -> "WaveletMatrix":
        assert alpha_size > 1
        seq = np.asarray(seq, dtype=np.uint8)
        assert (seq < alpha_size).all()
        n_levels = max(1, int(alpha_size - 1).bit_length())
        assert n_levels <= 8

        levels = []
        zeros = []
        cur = seq.copy()
        for l in range(n_levels):
            hi_bit = n_levels - 1 - l
            bits = (cur & np.uint8(1 << hi_bit)) > 0
            levels.append(BitVector.from_bools(bits))
            zeros.append(int((~bits).sum()))
            cur = cur[np.argsort(bits, kind="stable")]

        alpha_offsets = np.full(alpha_size, _NO_SYM, dtype=np.int64)
        if len(cur):
            change = np.concatenate([[True], cur[1:] != cur[:-1]])
            alpha_offsets[cur[change]] = np.flatnonzero(change)
        return cls(levels, zeros, alpha_offsets, len(seq), alpha_size)

    # -------------------------------------------------------- host queries
    def has_symbol(self, a) -> np.ndarray:
        return self.alpha_offsets[np.asarray(a, dtype=np.int64)] != _NO_SYM

    def access(self, i) -> np.ndarray:
        return np.asarray(wm_access(self.device_arrays(), np.asarray(i), np))

    def rank(self, a, i) -> np.ndarray:
        return np.asarray(wm_rank(self.device_arrays(), a, i, np))

    def select(self, a, r) -> np.ndarray:
        """Position of the r-th occurrence of a (-1 if out of range)."""
        return np.asarray(wm_select(self.device_arrays(), a, r, np))

    def __len__(self) -> int:
        return self.length

    def num_bits(self) -> int:
        return sum(l.num_bits() for l in self.levels) + 64 * (
            len(self.zeros) + len(self.alpha_offsets)
        )

    # --------------------------------------------------------------- device
    def device_arrays(self) -> dict:
        d = {
            "zeros": self.zeros,
            "alpha_offsets": self.alpha_offsets,
            "meta": meta(
                n_levels=self.n_levels,
                length=self.length,
                alpha_size=self.alpha_size,
            ),
        }
        for l, bv in enumerate(self.levels):
            lv = bv.device_arrays()
            # zero-prefix per word for select_zero (monotone, searchsorted-able)
            nw = len(bv.blocks) - 1
            lv["zero_blocks"] = (
                np.arange(nw + 1, dtype=np.int64) * 64 - bv.blocks.astype(np.int64)
            )
            d[f"level{l}"] = lv
        return d


class WaveletMatrixSlice:
    """Offset-window view of a WaveletMatrix (parity: reference
    src/wm.rs:13-44): behaves like a WM built over ``S[start:end]`` using
    the rank-difference trick — rank within the window is
    ``rank(a, start+i) - rank(a, start)`` and select re-bases the
    occurrence rank by ``rank(a, start)``. No data is copied."""

    def __init__(self, wm: "WaveletMatrix", start: int, end: int):
        assert 0 <= start <= end <= len(wm)
        self.wm = wm
        self.start = int(start)
        self.len = int(end - start)

    def __len__(self) -> int:
        return self.len

    def is_empty(self) -> bool:
        return self.len == 0

    def access(self, i) -> np.ndarray:
        i = np.asarray(i)
        assert (i < self.len).all()
        return self.wm.access(self.start + i)

    def rank(self, a, i) -> np.ndarray:
        i = np.asarray(i)
        assert (i <= self.len).all()
        return self.wm.rank(a, self.start + i) - self.wm.rank(a, self.start)

    def select(self, a, r) -> np.ndarray:
        """Window position of the r-th in-window occurrence of ``a``.

        Reference semantics (src/wm.rs:39-43): rebases by rank(a, start)
        and returns ``wm.select(a, base+r) - start`` — the result may lie
        PAST the window end when fewer than r+1 occurrences fall inside;
        -1 only when the sequence holds no (base+r+1)-th occurrence at all
        (the reference's None)."""
        r = np.asarray(r)
        base = self.wm.rank(a, self.start)
        n_total = self.wm.rank(a, len(self.wm))
        s = self.wm.select(a, base + r) - self.start
        return np.where(base + r < n_total, s, -1)


def wm_slice_access(d: dict, start, i, xp):
    return wm_access(d, xp.asarray(start) + xp.asarray(i), xp)


def wm_slice_rank(d: dict, a, start, i, xp):
    start = xp.asarray(start)
    return wm_rank(d, a, start + xp.asarray(i), xp) - wm_rank(d, a, start, xp)


def wm_slice_select(d: dict, a, start, r, xp):
    """Batched slice select; -1 when the occurrence does not exist in the
    window."""
    start = xp.asarray(start)
    r = xp.asarray(r)
    base = wm_rank(d, a, start, xp)
    s = wm_select(d, a, base + r, xp)
    n_total = wm_rank(d, a, xp.full(xp.shape(start), d["meta"].length), xp)
    ok = base + r < n_total
    return xp.where(ok, s - start, xp.full(xp.shape(s), -1, dtype=xp.int64))


def _bv_rank_zero(lv, i, xp):
    return xp.asarray(i) - bv_rank(lv, i, xp)


def _bv_select_zero(lv, r, xp):
    """Position of the r-th zero bit; mirrors bv_select over complement."""
    r = xp.asarray(r)
    zb = lv["zero_blocks"]
    wi = xp.searchsorted(zb, (r + 1).astype(zb.dtype), side="left") - 1
    rem = r - zb[wi]
    word = ~lv["words"][wi]
    pos = wi.astype(xp.int64) * 64
    for shift in (32, 16, 8, 4, 2, 1):
        m = U64((1 << shift) - 1)
        c = _popcount(xp, word & m)
        go = rem >= c
        rem = xp.where(go, rem - c, rem)
        pos = xp.where(go, pos + shift, pos)
        word = xp.where(go, word >> U64(shift), word)
    return pos


def wm_access(d: dict, i, xp):
    """access(i) — reference src/wm.rs:223-240. Batched."""
    m = d["meta"]
    j = xp.asarray(i)
    alpha = xp.zeros(xp.shape(j), dtype=xp.int64)
    for l in range(m.n_levels):
        lv = d[f"level{l}"]
        hi_bit = m.n_levels - 1 - l
        bit = bv_get_bit(lv, j, xp)
        r = bv_rank(lv, j, xp)
        j = xp.where(bit, d["zeros"][l] + r, j - r)
        alpha = alpha | xp.where(bit, xp.int64(1 << hi_bit), xp.int64(0))
    return alpha


def wm_rank(d: dict, a, i, xp):
    """rank(a, i) = # of a in S[0, i) — reference src/wm.rs:242-269. Batched."""
    m = d["meta"]
    a = xp.asarray(a).astype(xp.int64)
    j = xp.asarray(i)
    for l in range(m.n_levels):
        lv = d[f"level{l}"]
        hi_bit = m.n_levels - 1 - l
        abit = (a & (1 << hi_bit)) > 0
        r = bv_rank(lv, j, xp)
        j = xp.where(abit, d["zeros"][l] + r, j - r)
    off = d["alpha_offsets"][xp.clip(a, 0, m.alpha_size - 1)]
    return xp.where(off == _NO_SYM, xp.zeros_like(j), j - off)


def wm_select(d: dict, a, r, xp):
    """select(a, r): position of the r-th occurrence (batched; -1 if the
    symbol is absent) — reference src/wm.rs:271-291."""
    m = d["meta"]
    a = xp.asarray(a).astype(xp.int64)
    r = xp.asarray(r)
    off = d["alpha_offsets"][xp.clip(a, 0, m.alpha_size - 1)]
    has = off != _NO_SYM
    j = xp.where(has, off, xp.zeros_like(off)) + r
    for l in range(m.n_levels - 1, -1, -1):
        lv = d[f"level{l}"]
        hi_bit = m.n_levels - 1 - l
        abit = (a & (1 << hi_bit)) > 0
        j1 = bv_select(lv, xp.clip(j - d["zeros"][l], 0, None), xp)
        j0 = _bv_select_zero(lv, j, xp)
        j = xp.where(abit, j1, j0)
    return xp.where(has, j, xp.full(xp.shape(j), -1, dtype=xp.int64))
