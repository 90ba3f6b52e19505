"""Fixed-width packed integer vector.

Behavioral replacement for ``simple_sds::int_vector::IntVector`` (and the
sdsl-compact on-disk layout loaded by reference src/pf1/cpp.rs:217-237):
``len`` integers of ``width`` bits packed LSB-first into uint64 words.

Device get is a 2-gather bit-window read. ``width`` must be <= 58 so any
element spans at most two words (true for every use in the reference: pos
vectors, offsets, packed occurrence tables).
"""

from __future__ import annotations

import numpy as np

from .bitvector import _read_window

U64 = np.uint64


class IntVector:
    def __init__(self, words: np.ndarray, length: int, width: int):
        assert 0 < width <= 58 or length == 0, f"width {width} unsupported"
        nw = (length * width + 63) // 64
        # pad >= 2 words so _read_window's words[wi+1] stays in-bounds even
        # for an empty vector (clipped gathers read bit 0 of word 0)
        w = np.zeros(max(nw + 1, 2), dtype=np.uint64)
        w[:nw] = words[:nw]
        self.words = w
        self.length = int(length)
        self.width = int(width)

    @classmethod
    def from_array(cls, values: np.ndarray, width: int | None = None) -> "IntVector":
        """Pack ``values`` with minimal (or given) bit width ("pack()" parity)."""
        values = np.asarray(values, dtype=np.uint64)
        n = len(values)
        if width is None:
            mx = int(values.max()) if n else 0
            width = max(1, mx.bit_length())
        width = int(width)
        if n == 0:
            return cls(np.zeros(0, dtype=np.uint64), 0, width)
        assert width <= 58
        nw = (n * width + 63) // 64
        if n >= (1 << 16):  # OpenMP packer (bitwise_or.at is ~350 ns/elem)
            from ..io.native import pack_width

            words = pack_width(values, width, nw)
            if words is not None:
                return cls(words, n, width)
        bit_pos = np.arange(n, dtype=np.int64) * width
        wi = bit_pos >> 6
        off = (bit_pos & 63).astype(np.uint64)
        words = np.zeros(nw + 1, dtype=np.uint64)
        mask = U64((1 << width) - 1)
        v = values & mask
        np.bitwise_or.at(words, wi, v << off)
        # spill into next word where the element crosses a boundary
        spill_shift = (U64(64) - off) & U64(63)
        hi = np.where(off == 0, U64(0), v >> spill_shift)
        np.bitwise_or.at(words, wi + 1, hi)
        return cls(words[:nw], n, width)

    def get(self, i) -> np.ndarray:
        i = np.asarray(i, dtype=np.int64)
        return _read_window(self.words, i * self.width, self.width, np)

    def to_array(self) -> np.ndarray:
        return self.get(np.arange(self.length, dtype=np.int64))

    def __len__(self) -> int:
        return self.length

    def num_bits(self) -> int:
        return 64 * len(self.words)

    def device_arrays(self) -> dict:
        from ..pytree import meta

        return {
            "words": self.words,
            "meta": meta(width=self.width, length=self.length),
        }


def iv_get(iv: dict, i, xp):
    """Device get: element(s) ``i`` of a packed IntVector pytree. The bit
    width comes from the static meta node, so masks/shifts are compile-time
    literals."""
    i = xp.asarray(i)
    width = iv["meta"].width
    return _read_window(iv["words"], i * width, width, xp)
