"""Elias-Fano compressed monotone sequence.

Re-design of reference src/elias_fano.rs for device querying: the same
high/low split (low ``l = max(1, msb(u/n))`` bits packed; high bits unary
gap coded with one stop bit per element), with ``get(i) =
((select(i) - i) << l) | low[i]`` — select runs on-device via the
BitVector select kernel (reference parity: src/elias_fano.rs:116-122).
"""

from __future__ import annotations

import numpy as np

from .bitvector import BitVector, bv_select
from .intvector import IntVector, iv_get

U64 = np.uint64


def _msb(n: int) -> int:
    """Index of most significant bit; msb(0) == 0 (reference src/util.rs:48-55)."""
    return max(0, int(n).bit_length() - 1)


from ..err import EFEmpty, EFNotMonotone  # noqa: F401  (canonical home: err.py)


class EFVector:
    def __init__(self, u: int, l: int, high_bits: BitVector, low_bits: IntVector):
        self.u = int(u)
        self.l = int(l)
        self.high_bits = high_bits
        self.low_bits = low_bits

    @classmethod
    def from_array(cls, xs: np.ndarray, u: int | None = None) -> "EFVector":
        xs = np.asarray(xs, dtype=np.uint64)
        n = len(xs)
        if n == 0:
            raise EFEmpty("EFVector of empty sequence")
        if np.any(xs[1:] < xs[:-1]):
            raise EFNotMonotone("sequence not monotone")
        if u is None:
            u = int(xs[-1])
        u = int(u)
        l = _msb(u // n)
        if l == 0:
            l = 1  # parity with reference hack, src/elias_fano.rs:64-74
        low = IntVector.from_array(xs & U64((1 << l) - 1), width=l)
        highs = (xs >> U64(l)).astype(np.int64)
        # set bit at (i + highs[i]) for each element
        set_pos = np.arange(n, dtype=np.int64) + highs
        hb_len = n + (u >> l)
        high_bits = BitVector.from_set_positions(set_pos, hb_len)
        return cls(u, l, high_bits, low)

    def __len__(self) -> int:
        return len(self.low_bits)

    def get(self, i) -> np.ndarray:
        i = np.asarray(i, dtype=np.int64)
        high = self.high_bits.select(i) - i
        return (high.astype(np.uint64) << U64(self.l)) | self.low_bits.get(i)

    def to_array(self) -> np.ndarray:
        return self.get(np.arange(len(self), dtype=np.int64))

    def num_bits(self) -> int:
        return 64 * 3 + self.high_bits.num_bits() + self.low_bits.num_bits()

    def device_arrays(self) -> dict:
        from ..pytree import meta

        return {
            "high": self.high_bits.device_arrays(),
            "low": self.low_bits.device_arrays(),
            "meta": meta(l=self.l, length=len(self)),
        }


def ef_get(ef: dict, i, xp):
    """Device EF get(i); low bit width is static via meta."""
    i = xp.asarray(i)
    high = bv_select(ef["high"], i, xp) - i
    low = iv_get(ef["low"], i, xp)
    return (high.astype(xp.uint64) << U64(ef["meta"].l)) | low
