"""UnitigSet: compact container of concatenated 2-bit unitigs.

Re-design of reference src/unitig_set.rs as flat arrays:
- ``useq``: the 2-bit concatenated unitig sequence (SeqVector)
- ``bv``: boundary bitvector, 1 marks the LAST base of each unitig,
  rank-enabled -> ``pos_to_id(pos) = bv.rank(pos)``
- ``accum``: int64[n_unitigs+1] prefix of unitig lengths (the reference
  stores this Elias-Fano; we keep a plain device array on the query path —
  accum is tiny next to useq — and expose ``ef_accum_lens()`` for the
  compressed form / size accounting parity).
"""

from __future__ import annotations

import numpy as np

from ..bits.bitvector import BitVector, bv_rank, bv_read_window
from ..bits.elias_fano import EFVector
from ..bits.seqvector import SeqVector, sv_get_kmer
from ..kmer import canonicalize
from ..pytree import meta


class UnitigSet:
    def __init__(self, k: int, useq: SeqVector, accum: np.ndarray, bv: BitVector | None = None):
        self.k = int(k)
        self.useq = useq
        self.accum = np.asarray(accum, dtype=np.int64)
        if bv is None:
            bv = BitVector.from_set_positions(self.accum[1:] - 1, int(self.accum[-1]))
        self.bv = bv

    # ------------------------------------------------------------- builders
    @classmethod
    def from_seqs(cls, seqs: list[str], k: int) -> "UnitigSet":
        """Parity: reference src/unitig_set.rs:74-106."""
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        accum = np.concatenate([[0], np.cumsum(lens)])
        useq = SeqVector.from_str("".join(seqs))
        return cls(k, useq, accum)

    @classmethod
    def from_cf(cls, cf_files) -> tuple["UnitigSet", dict]:
        """Build from cuttlefish reduced-GFA output; returns the set and the
        cuttlefish-id -> dense-id map (reference src/unitig_set.rs:119-165)."""
        from ..io.cuttlefish import CfInfo, iter_segs

        info = CfInfo.from_path(cf_files.json)
        seqs = []
        cfid2uid = {}
        for i, (cfid, seq) in enumerate(iter_segs(cf_files)):
            cfid2uid[cfid] = i
            seqs.append(seq)
        return cls.from_seqs(seqs, info.k), cfid2uid

    # ------------------------------------------------------------ accessors
    @property
    def n_unitigs(self) -> int:
        return len(self.accum) - 1

    @property
    def total_len(self) -> int:
        return int(self.accum[-1])

    @property
    def n_kmers(self) -> int:
        return self.total_len - self.k * self.n_unitigs + self.n_unitigs

    def unitig_len(self, i) -> np.ndarray:
        i = np.asarray(i)
        return self.accum[i + 1] - self.accum[i]

    def pos_to_id(self, pos) -> np.ndarray:
        return self.bv.rank(pos)

    def unitig_seq_str(self, i: int) -> str:
        return self.useq.to_str(int(self.accum[i]), int(self.accum[i + 1]))

    def get_kmer_u64(self, pos) -> np.ndarray:
        return self.useq.get_kmer_u64(pos, self.k)

    def is_valid_useq_pos(self, pos) -> np.ndarray:
        """No unitig boundary inside the k-mer window (reference
        src/unitig_set.rs:235-245)."""
        pos = np.asarray(pos, dtype=np.int64)
        in_range = pos <= self.total_len - self.k
        w = self.bv.read_window(np.clip(pos, 0, self.total_len - self.k), self.k - 1)
        return in_range & (w == 0)

    def kmer_start_positions(self) -> np.ndarray:
        """Global useq positions of all valid k-mers, in unitig order."""
        from ..io.native import expand_ranges

        starts = self.accum[:-1]
        ends = self.accum[1:] - self.k + 1
        counts = ends - starts
        return expand_ranges(starts, counts)

    def all_canonical_kmers(self) -> np.ndarray:
        """Canonical u64 word of every k-mer (for MPHF construction)."""
        pos = self.kmer_start_positions()
        fw = self.useq.get_kmer_u64(pos, self.k)
        canon, _, _ = canonicalize(fw, self.k)
        return canon

    def ef_accum_lens(self) -> EFVector:
        return EFVector.from_array(self.accum.astype(np.uint64))

    def num_bits(self) -> int:
        return 64 + self.useq.num_bits() + self.ef_accum_lens().num_bits() + self.bv.num_bits()

    def print_stats(self, log=print):
        """Size accounting (reference src/unitig_set.rs:50-71)."""
        nk, tl = self.n_kmers, self.total_len
        log(f"{self.num_bits() / nk:.5f} bits per kmer")
        log(f"seq: {self.useq.num_bits() / tl:.5f} bits per nuc")
        log(f"bv: {self.bv.num_bits() / tl:.5f} bits per nuc")
        log(f"accum_lens: {self.ef_accum_lens().num_bits() / nk:.5f} bits per km")

    # --------------------------------------------------------------- device
    def device_arrays(self, paired: bool = False) -> dict:
        """``paired=True`` adds pair-packed views so the query path fetches
        adjacent elements with ONE gather each instead of two:

        - ``useq.words2[i] = (words[i], words[i+1])`` — a k-mer window read
          becomes a single 2-wide gather
        - ``bv.wb2[i] = (words[i], blocks[i])`` — rank(pos) becomes a single
          2-wide gather + popcount
        - ``accum2[u] = (start, end)`` — unitig extent in one gather

        ~2x memory on these (small) arrays for ~2x fewer random accesses.
        """
        d = {
            "useq": self.useq.device_arrays(),
            "bv": self.bv.device_arrays(),
            "accum": self.accum,
            "meta": meta(
                k=self.k,
                n_unitigs=self.n_unitigs,
                total_len=self.total_len,
                paired=paired,
            ),
        }
        if paired:
            w = self.useq.words
            wnext = np.concatenate([w[1:], np.zeros(1, dtype=np.uint64)])
            d["useq"]["words2"] = np.stack([w, wnext], axis=1)
            bw = self.bv.words
            d["bv"]["wb2"] = np.stack(
                [bw, self.bv.blocks.astype(np.uint64)], axis=1
            )
            d["accum2"] = np.stack([self.accum[:-1], self.accum[1:]], axis=1)
        return d


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def us_get_kmer(us: dict, pos, xp):
    if "words2" in us["useq"]:  # paired layout: one 2-wide gather
        k = us["meta"].k
        pos = xp.asarray(pos)
        bit = pos * 2
        wi = bit >> 6
        off = (bit & 63).astype(xp.uint64)
        pair = us["useq"]["words2"][wi]
        lo = pair[..., 0] >> off
        hi_shift = (np.uint64(64) - off) & np.uint64(63)
        hi = pair[..., 1] << hi_shift
        hi = xp.where(off == 0, xp.zeros_like(hi), hi)
        return (lo | hi) & np.uint64((1 << (2 * k)) - 1)
    return sv_get_kmer(us["useq"], pos, xp, us["meta"].k)


def us_rank(us: dict, pos, xp):
    """Boundary-bv rank; paired layout does it with one 2-wide gather."""
    if "wb2" in us["bv"]:
        pos = xp.asarray(pos)
        wi = pos >> 6
        off = pos.astype(xp.uint64) & np.uint64(63)
        pair = us["bv"]["wb2"][wi]
        word, blocks = pair[..., 0], pair[..., 1]
        mask = xp.where(
            off == 0,
            np.uint64(0),
            (~np.uint64(0)).astype(xp.uint64) >> (np.uint64(64) - off),
        )
        if xp is np:
            pc = np.bitwise_count(word & mask).astype(np.int64)
        else:
            import jax.lax as lax

            pc = lax.population_count(word & mask).astype(xp.int64)
        return blocks.astype(xp.int64) + pc
    return bv_rank(us["bv"], pos, xp)


def us_extent(us: dict, uid, xp):
    """(start, end) of unitig(s); paired layout: one 2-wide gather."""
    if "accum2" in us:
        pair = us["accum2"][uid]
        return pair[..., 0], pair[..., 1]
    start = us["accum"][uid]
    return start, us["accum"][uid + 1]


def us_pos_to_id(us: dict, pos, xp):
    return bv_rank(us["bv"], pos, xp)


def us_is_valid_pos(us: dict, pos, xp):
    m = us["meta"]
    pos = xp.asarray(pos)
    in_range = (pos >= 0) & (pos <= m.total_len - m.k)
    w = bv_read_window(us["bv"], xp.clip(pos, 0, max(0, m.total_len - m.k)), m.k - 1, xp)
    return in_range & (w == 0)


def us_validate_rank(us: dict, pos, xp):
    """Fused ``us_is_valid_pos`` + ``us_rank`` in ONE wb2 window.

    Both primitives start from the same boundary-bv word ``pos >> 6``:
    validity reads the (k-1)-bit window at ``pos`` (spans <= 2 words for
    k <= 32), rank reads the word's block prefix + the bits below
    ``pos & 63``. The paired ``wb2`` rows carry (word, blocks), so one
    random 2-wide gather + one ADJACENT 2-wide gather serve both — vs
    the separate calls' 2-word window read PLUS an independent wb2
    fetch (~2 random gathers saved per lane on the capacity tier).

    Returns ``(valid, uid)``; ``uid`` is meaningful wherever the input
    position was (validity of the position itself is reported, callers
    gate on it). Requires the paired device layout (``wb2``)."""
    m = us["meta"]
    pos = xp.asarray(pos)
    in_range = (pos >= 0) & (pos <= m.total_len - m.k)
    p = xp.clip(pos, 0, max(0, m.total_len - m.k))
    wi = p >> 6
    off = p.astype(xp.uint64) & np.uint64(63)
    wb2 = us["bv"]["wb2"]
    nw = wb2.shape[0]
    pair0 = wb2[wi]
    pair1 = wb2[xp.clip(wi + 1, 0, nw - 1)]
    word0, blocks = pair0[..., 0], pair0[..., 1]
    word1 = pair1[..., 0]
    # rank(p) = blocks + popcount(word0 & bits-below-off)
    mask = xp.where(
        off == 0,
        np.uint64(0),
        (~np.uint64(0)).astype(xp.uint64) >> (np.uint64(64) - off),
    )
    if xp is np:
        pc = np.bitwise_count(word0 & mask).astype(np.int64)
    else:
        import jax.lax as lax

        pc = lax.population_count(word0 & mask).astype(xp.int64)
    uid = blocks.astype(xp.int64) + pc
    # validity: boundary bits [p, p+k-1) all zero (same predicate as
    # bv_read_window(p, k-1) == 0)
    hi_shift = (np.uint64(64) - off) & np.uint64(63)
    hi = xp.where(off == 0, xp.zeros_like(word1), word1 << hi_shift)
    win = ((word0 >> off) | hi) & np.uint64((1 << (m.k - 1)) - 1)
    return in_range & (win == 0), uid
