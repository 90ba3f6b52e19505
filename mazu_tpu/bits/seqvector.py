"""2-bit packed DNA sequence vector.

Behavioral replacement for the ``kmers`` crate SeqVector (and the sdsl
int_vector<2> layout of pufferfish seq.bin / refseq.bin): base ``i`` at bits
``[2i, 2i+2)`` of the LSB-first uint64 word stream; ``get_kmer_u64(pos, k)``
is a raw 2k-bit window read (reference src/unitig_set.rs:226-229).
"""

from __future__ import annotations

import numpy as np

from ..kmer import seq_to_codes, kmer_to_str
from .bitvector import _read_window

U64 = np.uint64


class SeqVector:
    def __init__(self, words: np.ndarray, length: int, _adopt: bool = False):
        nw = (2 * length + 63) // 64
        if _adopt:
            # caller guarantees words is uint64[nw+1] with a zero guard
            # word — skip the defensive copy (0.5 GB of fresh pages per
            # Gbp otherwise)
            assert len(words) == nw + 1 and words.dtype == np.uint64
            self.words = words
        else:
            w = np.zeros(nw + 1, dtype=np.uint64)
            w[:nw] = words[:nw]
            self.words = w
        self.length = int(length)  # number of bases

    @classmethod
    def from_codes(cls, codes: np.ndarray) -> "SeqVector":
        codes = np.asarray(codes, dtype=np.uint8)
        assert (codes < 4).all(), "invalid base code"
        n = len(codes)
        from ..io.native import pack_codes2

        words = pack_codes2(codes)
        if words is not None:  # native: one parallel pass, no u64 temps
            return cls(words, n, _adopt=True)
        pad = (-n) % 32
        c = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)]).astype(np.uint64)
        c = c.reshape(-1, 32)
        shifts = (np.arange(32, dtype=np.uint64) * U64(2))[None, :]
        words = np.bitwise_or.reduce(c << shifts, axis=1)
        return cls(words, n)

    @classmethod
    def from_str(cls, seq: str | bytes) -> "SeqVector":
        return cls.from_codes(seq_to_codes(seq))

    def get_base(self, pos) -> np.ndarray:
        pos = np.asarray(pos, dtype=np.int64)
        return ((self.words[pos >> 5] >> ((pos.astype(np.uint64) & U64(31)) * U64(2))) & U64(3)).astype(np.uint8)

    def get_kmer_u64(self, pos, k: int) -> np.ndarray:
        """k-mer word(s) at base position(s) ``pos`` (may cross two words)."""
        pos = np.asarray(pos, dtype=np.int64)
        return _read_window(self.words, pos * 2, 2 * int(k), np)

    def to_str(self, start: int = 0, end: int | None = None) -> str:
        end = self.length if end is None else end
        out = []
        for p in range(start, end, 31):
            kk = min(31, end - p)
            out.append(kmer_to_str(int(self.get_kmer_u64(p, kk)), kk))
        return "".join(out)

    def __len__(self) -> int:
        return self.length

    def num_bits(self) -> int:
        return 64 * len(self.words)

    def device_arrays(self) -> dict:
        from ..pytree import meta

        return {"words": self.words, "meta": meta(length=self.length)}


def sv_get_kmer(sv: dict, pos, xp, k: int):
    """Device k-mer fetch: 2 gathers + shift/or; ``k`` static."""
    pos = xp.asarray(pos)
    return _read_window(sv["words"], pos * 2, 2 * int(k), xp)
