"""U2Pos occurrence tables (L3b): unitig id -> encoded reference occurrences.

Two encodings (reference parity):
- pf1 64-bit word: |1b orientation|31b pos|32b ref_id|
  (reference src/index.rs:315-346)
- piscem packed word: ref_id << ref_shift | pos << 1 | is_fw, minimal
  widths (reference src/spt_compact.rs:83-112)

Both tables are an inverted list: ``ctable`` (flat encoded occurrences,
grouped by unitig) + ``offsets`` (int64[n_unitigs+1] prefix).
"""

from __future__ import annotations

import numpy as np

from ..bits.intvector import IntVector, iv_get
from ..pytree import meta

U64 = np.uint64


def encode_pf1(ref_id, pos, o) -> np.ndarray:
    word = np.asarray(pos, dtype=np.uint64)
    word = word | (np.asarray(o, dtype=np.uint64) << U64(31))
    return (word << U64(32)) | np.asarray(ref_id, dtype=np.uint64)


def decode_pf1(word, xp):
    ref_id = (word & U64(0xFFFFFFFF)).astype(xp.int64)
    posw = word >> U64(32)
    pos = (posw & U64(0x7FFFFFFF)).astype(xp.int64)
    o = ((posw >> U64(31)) & U64(1)).astype(xp.int32)
    return ref_id, pos, o


def required_num_bits(longest_ref: int, num_refs: int) -> tuple[int, int, int]:
    """(pos_bits, ref_bits, total) for piscem packing
    (reference src/spt_compact.rs:221-242)."""
    pos_bits = max(1, int(longest_ref).bit_length())
    ref_bits = max(1, int(num_refs).bit_length())
    total = pos_bits + ref_bits + 1
    assert total <= 58, "piscem occ does not fit packed word"
    return pos_bits, ref_bits, total


def encode_piscem(ref_id, pos, o, ref_shift: int) -> np.ndarray:
    e = np.asarray(ref_id, dtype=np.uint64) << U64(ref_shift)
    e = e | (np.asarray(pos, dtype=np.uint64) << U64(1))
    return e | np.asarray(o, dtype=np.uint64)


def decode_piscem(word, ref_shift: int, pos_mask: int, xp):
    ref_id = (word >> U64(ref_shift)).astype(xp.int64)
    pos = ((word >> U64(1)) & U64(pos_mask)).astype(xp.int64)
    o = (word & U64(1)).astype(xp.int32)
    return ref_id, pos, o


class DenseUnitigTable:
    """u64-word table (pf1 encoding). Reference src/index/dense_unitig_table.rs:12-76."""

    def __init__(self, ctable: np.ndarray, offsets: np.ndarray, ref_names=None, ref_exts=None):
        self.ctable = np.asarray(ctable, dtype=np.uint64)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.ref_names = ref_names or []
        self.ref_exts = ref_exts

    def num_bits(self) -> int:
        return 8 * (self.ctable.nbytes + self.offsets.nbytes)

    @property
    def n_unitigs(self) -> int:
        return len(self.offsets) - 1

    @property
    def n_total_occs(self) -> int:
        return len(self.ctable)

    def occs(self, uid: int):
        """Decoded occurrences of one unitig (host): (ref_id, pos, o) arrays."""
        s, e = self.offsets[uid], self.offsets[uid + 1]
        return decode_pf1(self.ctable[s:e], np)

    def max_occs(self) -> int:
        return int(np.max(self.offsets[1:] - self.offsets[:-1])) if self.n_unitigs else 0

    def device_arrays(self, paired: bool = True) -> dict:
        d = {
            "ctable": self.ctable,
            "offsets": self.offsets,
            "meta": meta(enc="pf1", n_occs=len(self.ctable)),
        }
        if paired:  # adjacent-occurrence pairs: one row gather per 2 occs
            c = np.concatenate([self.ctable, np.zeros(1, dtype=np.uint64)])
            pair = np.ascontiguousarray(np.stack([c[:-1], c[1:]], axis=1))
            # u32 rows: 2x cheaper row gathers than u64 (measured)
            d["ctable2"] = pair.view(np.uint32).reshape(len(c) - 1, 4)
        return d


class PiscemUnitigTable:
    """Packed minimal-width table (piscem encoding).
    Reference src/index/dense_unitig_table.rs:109-153."""

    def __init__(
        self,
        ctable: IntVector,
        offsets: np.ndarray,
        ref_shift: int,
        pos_mask: int,
        ref_names=None,
        ref_exts=None,
    ):
        self.ctable = ctable
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.ref_shift = int(ref_shift)
        self.pos_mask = int(pos_mask)
        self.ref_names = ref_names or []
        self.ref_exts = ref_exts

    def num_bits(self) -> int:
        return self.ctable.num_bits() + 8 * self.offsets.nbytes

    @property
    def n_unitigs(self) -> int:
        return len(self.offsets) - 1

    @property
    def n_total_occs(self) -> int:
        return len(self.ctable)

    def occs(self, uid: int):
        s, e = int(self.offsets[uid]), int(self.offsets[uid + 1])
        words = self.ctable.get(np.arange(s, e))
        return decode_piscem(words, self.ref_shift, self.pos_mask, np)

    def max_occs(self) -> int:
        return int(np.max(self.offsets[1:] - self.offsets[:-1])) if self.n_unitigs else 0

    @classmethod
    def from_dense(cls, dense: "DenseUnitigTable", ref_lens=None) -> "PiscemUnitigTable":
        """Re-encode a pf1 dense table into the minimal-width piscem packing
        (decode_pf1 -> encode_piscem; same occurrences, fewer bits — and
        u32-width words when the reference set is small enough, which
        enables the mono2 occ32 slot layout)."""
        words = np.asarray(dense.ctable, dtype=np.uint64)
        ref_id, pos, o = decode_pf1(words, np)
        if ref_lens is not None and len(ref_lens):
            longest = int(np.max(ref_lens))
            num_refs = int(len(ref_lens))
        else:
            longest = int(pos.max()) + 1 if len(pos) else 1
            num_refs = int(ref_id.max()) + 1 if len(ref_id) else 1
        pos_bits, ref_bits, total = required_num_bits(longest, num_refs)
        ref_shift = pos_bits + 1
        packed = encode_piscem(ref_id, pos, o, ref_shift)
        return cls(
            IntVector.from_array(packed, width=total),
            dense.offsets,
            ref_shift,
            (1 << pos_bits) - 1,
            ref_names=dense.ref_names,
            ref_exts=dense.ref_exts,
        )

    def device_arrays(self, paired: bool = True) -> dict:
        d = {
            "ctable": self.ctable.device_arrays(),
            "offsets": self.offsets,
            "meta": meta(
                enc="piscem",
                ref_shift=self.ref_shift,
                pos_mask=self.pos_mask,
                n_occs=len(self.ctable),
            ),
        }
        if paired:  # unpacked pairs for the 1-row-gather-per-2-occs path
            c = np.concatenate(
                [self.ctable.to_array(), np.zeros(1, dtype=np.uint64)]
            )
            pair = np.ascontiguousarray(np.stack([c[:-1], c[1:]], axis=1))
            d["ctable2"] = pair.view(np.uint32).reshape(len(c) - 1, 4)
        return d


class WMUnitigTable:
    """Experimental U2Pos: piscem-encoded occurrence words stored as
    byte-plane WaveletMatrices.

    This is the occurrence-table compression experiment the reference
    reserves its WaveletMatrix for (README highlight 4; the WM is built
    and tested but unwired there, src/wm.rs). Each 8-bit plane of the
    packed occurrence word becomes one WM whose alphabet is the plane's
    actual byte range — planes with few distinct values (high ref_id
    bytes, orientation-dominated low planes) store fewer levels than the
    flat packing. Decode is exact and batched (one wm_access per plane);
    ``unitig_slice`` exposes per-unitig WaveletMatrixSlice windows for
    symbol rank/select inside one unitig's occurrence list."""

    def __init__(self, planes, offsets, ref_shift: int, pos_mask: int, ref_names=None):
        from ..bits.wm import WaveletMatrix  # noqa: F401 (type)

        self.planes = list(planes)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.ref_shift = int(ref_shift)
        self.pos_mask = int(pos_mask)
        self.ref_names = ref_names or []

    @classmethod
    def from_piscem(cls, t: "PiscemUnitigTable") -> "WMUnitigTable":
        from ..bits.wm import WaveletMatrix

        words = t.ctable.to_array()
        width = t.ctable.width
        n_planes = max(1, -(-width // 8))
        planes = []
        for b in range(n_planes):
            plane = ((words >> U64(8 * b)) & U64(0xFF)).astype(np.uint8)
            alpha = max(2, int(plane.max()) + 1) if len(plane) else 2
            planes.append(WaveletMatrix.build(plane, alpha))
        return cls(planes, t.offsets, t.ref_shift, t.pos_mask, ref_names=t.ref_names)

    @property
    def n_unitigs(self) -> int:
        return len(self.offsets) - 1

    @property
    def n_total_occs(self) -> int:
        return len(self.planes[0]) if self.planes else 0

    def max_occs(self) -> int:
        return int(np.max(self.offsets[1:] - self.offsets[:-1])) if self.n_unitigs else 0

    def num_bits(self) -> int:
        return sum(p.num_bits() for p in self.planes) + 64 * len(self.offsets)

    def _words(self, idx: np.ndarray) -> np.ndarray:
        w = np.zeros(len(idx), dtype=np.uint64)
        for b, p in enumerate(self.planes):
            w |= p.access(idx).astype(np.uint64) << U64(8 * b)
        return w

    def occs(self, uid: int):
        s, e = int(self.offsets[uid]), int(self.offsets[uid + 1])
        return decode_piscem(self._words(np.arange(s, e)), self.ref_shift, self.pos_mask, np)

    def unitig_slice(self, uid: int, plane: int = 0):
        """WaveletMatrixSlice over one unitig's occurrence window of the
        given byte plane (reference src/wm.rs:13-44 usage)."""
        from ..bits.wm import WaveletMatrixSlice

        s, e = int(self.offsets[uid]), int(self.offsets[uid + 1])
        return WaveletMatrixSlice(self.planes[plane], s, e)

    def device_arrays(self, paired: bool = False) -> dict:
        d = {
            "offsets": self.offsets,
            "meta": meta(
                enc="wm",
                n_planes=len(self.planes),
                ref_shift=self.ref_shift,
                pos_mask=self.pos_mask,
                n_occs=self.n_total_occs,
            ),
        }
        for b, p in enumerate(self.planes):
            d[f"wm{b}"] = p.device_arrays()
        return d


def decode_words(u2pos: dict, words, xp):
    """Decode already-fetched encoded occurrence words (encoding static)."""
    m = u2pos["meta"]
    if m.enc == "pf1":
        return decode_pf1(words, xp)
    if m.enc == "piscem":
        return decode_piscem(words, m.ref_shift, m.pos_mask, xp)
    raise ValueError(m.enc)


def decode_occs(u2pos: dict, occ_idx, xp):
    """Decode occurrences at flat ctable indices (device; encoding static)."""
    m = u2pos["meta"]
    if m.enc == "pf1":
        words = u2pos["ctable"][occ_idx]
        return decode_pf1(words, xp)
    elif m.enc == "piscem":
        words = iv_get(u2pos["ctable"], occ_idx, xp)
        return decode_piscem(words, m.ref_shift, m.pos_mask, xp)
    elif m.enc == "wm":
        from ..bits.wm import wm_access

        words = xp.zeros(xp.shape(occ_idx), dtype=xp.uint64)
        for b in range(m.n_planes):
            plane = wm_access(u2pos[f"wm{b}"], occ_idx, xp).astype(xp.uint64)
            words = words | (plane << U64(8 * b))
        return decode_piscem(words, m.ref_shift, m.pos_mask, xp)
    raise ValueError(m.enc)


def fetch_occ_block(u2pos: dict, start, max_occs: int, xp):
    """Fetch ``max_occs`` consecutive encoded occurrence words from ``start``
    per query. Uses pair rows (one gather per 2 occurrences) when available."""
    n_occs = u2pos["meta"].n_occs
    if "ctable2" in u2pos:
        n_pairs = (max_occs + 1) // 2
        jj = xp.arange(n_pairs, dtype=start.dtype) * 2
        pair_idx = xp.clip(start[:, None] + jj[None, :], 0, max(n_occs - 1, 0))
        r32 = u2pos["ctable2"][pair_idx]  # [N, n_pairs, 4] u32
        lo = r32[..., 0::2].astype(xp.uint64)
        hi = r32[..., 1::2].astype(xp.uint64)
        words = (lo | (hi << np.uint64(32))).reshape(r32.shape[0], 2 * n_pairs)[
            :, :max_occs
        ]
        return decode_words(u2pos, words, xp)
    j = xp.arange(max_occs, dtype=start.dtype)
    occ_idx = xp.clip(start[:, None] + j[None, :], 0, max(n_occs - 1, 0))
    return decode_occs(u2pos, occ_idx, xp)
