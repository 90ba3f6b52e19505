"""Rank/select bitvector over uint64 words.

Behavioral replacement for ``simple_sds::bit_vector::BitVector`` as used by
the reference (conventions: ``rank(i)`` = number of ones in ``[0, i)``;
``select(r)`` = position of the r-th one, 0-based; raw ``int(pos, width)``
window reads for boundary checks, reference src/unitig_set.rs:242).

Layout (arrays-first): ``words`` uint64[nw+1] (one zero pad word so window
reads never gather out of bounds) and ``blocks`` uint32[nw+1], the exclusive
prefix popcount per word. rank is 2 gathers; select is a binary search over
``blocks`` plus an in-word 6-step bisection — all jit/vmap friendly.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_ONE = U64(1)
_ZERO = U64(0)


def _popcount_np(x):
    x = np.asarray(x, dtype=np.uint64)
    return np.bitwise_count(x).astype(np.uint32)


class BitVector:
    """Host-side bitvector with rank/select support arrays."""

    def __init__(self, words: np.ndarray, n_bits: int):
        nw = (n_bits + 63) // 64
        assert len(words) >= nw
        self.n_bits = int(n_bits)
        # pad >= 2 words so _read_window's words[wi+1] stays in-bounds even
        # for an empty vector (clipped gathers read bit 0 of word 0)
        w = np.zeros(max(nw + 1, 2), dtype=np.uint64)
        w[:nw] = words[:nw]
        # mask tail bits beyond n_bits
        tail = n_bits % 64
        if nw > 0 and tail:
            w[nw - 1] &= U64((1 << tail) - 1)
        self.words = w
        pc = _popcount_np(self.words)
        self.blocks = np.zeros(nw + 1, dtype=np.uint32)
        np.cumsum(pc[:nw], out=self.blocks[1:])
        self.n_ones = int(self.blocks[nw])

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_bools(cls, bits: np.ndarray) -> "BitVector":
        bits = np.asarray(bits, dtype=bool)
        n = len(bits)
        pad = (-n) % 64
        b = np.concatenate([bits, np.zeros(pad, dtype=bool)])
        words = np.packbits(b.reshape(-1, 8)[:, ::-1]).view(np.uint64)
        return cls(words, n)

    @classmethod
    def from_set_positions(cls, positions: np.ndarray, n_bits: int) -> "BitVector":
        positions = np.asarray(positions, dtype=np.int64)
        nw = (n_bits + 63) // 64
        words = np.zeros(nw, dtype=np.uint64)
        np.bitwise_or.at(
            words, positions >> 6, _ONE << (positions.astype(np.uint64) & U64(63))
        )
        return cls(words, n_bits)

    # -- host-side queries (NumPy, for tests/builders) ----------------------
    def get_bit(self, pos) -> np.ndarray:
        pos = np.asarray(pos, dtype=np.int64)
        return ((self.words[pos >> 6] >> (pos.astype(np.uint64) & U64(63))) & _ONE) != 0

    def rank(self, pos) -> np.ndarray:
        """#ones in [0, pos). Vectorized."""
        pos = np.asarray(pos, dtype=np.int64)
        wi = pos >> 6
        off = pos.astype(np.uint64) & U64(63)
        mask = np.where(off == 0, _ZERO, (~_ZERO) >> (U64(64) - off))
        return self.blocks[wi].astype(np.int64) + _popcount_np(self.words[wi] & mask).astype(np.int64)

    def select(self, r) -> np.ndarray:
        """Position of the r-th one (0-based). Vectorized host version."""
        r = np.asarray(r, dtype=np.int64)
        wi = np.searchsorted(self.blocks, r, side="right") - 1
        rem = (r - self.blocks[wi].astype(np.int64)).astype(np.int64)
        word = self.words[wi]
        pos = wi * 64
        shift = 32
        while shift >= 1:
            m = U64((1 << shift) - 1)
            c = _popcount_np(word & m).astype(np.int64)
            go = rem >= c
            rem = np.where(go, rem - c, rem)
            pos = np.where(go, pos + shift, pos)
            word = np.where(go, word >> U64(shift), word)
            shift //= 2
        return pos

    def read_window(self, pos, width: int) -> np.ndarray:
        """Raw ``width``-bit window read at bit offset ``pos`` (width <= 58)."""
        return _read_window(self.words, np.asarray(pos, dtype=np.int64), width, np)

    def count_ones(self) -> int:
        return self.n_ones

    def num_bits(self) -> int:
        return 64 * len(self.words) + 32 * len(self.blocks)

    # -- device pytree ------------------------------------------------------
    def device_arrays(self) -> dict:
        from ..pytree import meta

        return {
            "words": self.words,
            "blocks": self.blocks,
            "meta": meta(n_bits=self.n_bits, n_ones=self.n_ones),
        }


# ----------------------------------------------------------------------------
# Pure jit-compatible query kernels over the device pytree
# ----------------------------------------------------------------------------


def _popcount(xp, x):
    if xp is np:
        return np.bitwise_count(np.asarray(x, dtype=np.uint64)).astype(np.int64)
    import jax.lax as lax

    return lax.population_count(x).astype(xp.int64)


def _read_window(words, pos, width, xp):
    """Read ``width`` bits at bit offset ``pos`` from padded word array."""
    wi = pos >> 6
    off = (pos & 63).astype(np.uint64) if xp is np else (pos & 63).astype(xp.uint64)
    lo = words[wi] >> off
    hi_shift = (U64(64) - off) & U64(63)  # off==0 -> shift 0, but hi masked out
    hi = words[wi + 1] << hi_shift
    hi = xp.where(off == 0, xp.zeros_like(hi), hi)
    m = U64((1 << int(width)) - 1) if int(width) < 64 else U64(0xFFFFFFFFFFFFFFFF)
    return (lo | hi) & m


def bv_get_bit(bv: dict, pos, xp):
    pos = xp.asarray(pos)
    wi = pos >> 6
    off = pos.astype(xp.uint64) & U64(63)
    return ((bv["words"][wi] >> off) & _ONE) != 0


def bv_rank(bv: dict, pos, xp):
    """rank(pos) = #ones in [0, pos): 2 gathers + popcount."""
    pos = xp.asarray(pos)
    wi = pos >> 6
    off = pos.astype(xp.uint64) & U64(63)
    mask = xp.where(off == 0, _ZERO, (~_ZERO).astype(xp.uint64) >> (U64(64) - off))
    return bv["blocks"][wi].astype(xp.int64) + _popcount(xp, bv["words"][wi] & mask)


def bv_select(bv: dict, r, xp):
    """select(r): binary search over block prefix counts + in-word bisect."""
    r = xp.asarray(r)
    wi = xp.searchsorted(bv["blocks"], (r + 1).astype(bv["blocks"].dtype), side="left") - 1
    rem = r - bv["blocks"][wi].astype(xp.int64)
    word = bv["words"][wi]
    pos = wi.astype(xp.int64) * 64
    for shift in (32, 16, 8, 4, 2, 1):
        m = U64((1 << shift) - 1)
        c = _popcount(xp, word & m)
        go = rem >= c
        rem = xp.where(go, rem - c, rem)
        pos = xp.where(go, pos + shift, pos)
        word = xp.where(go, word >> U64(shift), word)
    return pos


def bv_read_window(bv: dict, pos, width: int, xp):
    return _read_window(bv["words"], xp.asarray(pos), width, xp)
