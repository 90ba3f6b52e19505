"""BBHash-style minimal perfect hash function (BooPHF).

Three roles (reference parity: src/pf1/boophf/mod.rs, load-only in mazu;
here we also BUILD, replacing the external ``boomphf`` crate used at
reference src/kphf/sshash.rs:177 and src/kphf/pfhash.rs:43):

1. ``BooPHF.from_pf1(path)`` — byte-parity load of pufferfish ``mphf.bin``.
2. ``BooPHF.build(keys, gamma)`` — vectorized host-side BBHash construction
   (NumPy): per level, keys hashing to singleton positions are assigned;
   colliding keys fall through; leftovers land in a final hash table.
3. ``boophf_lookup(d, keys, xp)`` — batched device query: for each level a
   chained hash -> Lemire fast-range -> bit test -> 512-bit-block rank;
   misses fall back to a sorted-array final-hash lookup. All O(1) gathers,
   jit-compatible.

The on-device value of a present key equals the C++ BooPHF value exactly
when loaded from pf1 files (the level rank arrays carry the cross-level
offsets, reference src/pf1/boophf/mod.rs:250-267).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hashes import (
    fast_range_64,
    multihash_h0,
    multihash_h1,
    multihash_next,
)
from ..io.pf1 import RawBooPHF, read_boophf

U64 = np.uint64

_BITS_PER_RANK_SAMPLE = 512  # parity: BoophfBitVec::NB_BITS_PER_SAMPLE


def _popcount(xp, x):
    if xp is np:
        return np.bitwise_count(np.asarray(x, dtype=np.uint64)).astype(np.int64)
    import jax.lax as lax

    return lax.population_count(x).astype(xp.int64)


@dataclass
class BooPHF:
    """Host-side BooPHF: levels of (n_bits, words, ranks) + final hash."""

    n_elem: int
    last_bitset_rank: int
    levels: list  # [(n_bits:int, words:u64[], ranks:u64[])], ranks global-offset
    fh_keys: np.ndarray  # sorted u64
    fh_vals: np.ndarray  # u64, already offset by last_bitset_rank
    gamma: float = 1.7

    # ------------------------------------------------------------------ load
    @classmethod
    def from_raw(cls, raw: RawBooPHF) -> "BooPHF":
        items = sorted(raw.final_hash.items())
        fh_keys = np.array([k for k, _ in items], dtype=np.uint64)
        fh_vals = np.array(
            [v + raw.last_bitset_rank for _, v in items], dtype=np.uint64
        )
        return cls(
            n_elem=raw.n_elem,
            last_bitset_rank=raw.last_bitset_rank,
            levels=[(int(n), w, r) for (n, w, r) in raw.levels],
            fh_keys=fh_keys,
            fh_vals=fh_vals,
            gamma=raw.gamma,
        )

    @classmethod
    def from_pf1(cls, path: str) -> "BooPHF":
        return cls.from_raw(read_boophf(path))

    # ----------------------------------------------------------------- build
    @classmethod
    def build(cls, keys: np.ndarray, gamma: float = 1.7, max_levels: int = 16) -> "BooPHF":
        """BBHash construction over distinct uint64 keys."""
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        rem = keys
        s0 = np.zeros(0, dtype=np.uint64)
        s1 = np.zeros(0, dtype=np.uint64)
        levels = []
        for li in range(max_levels):
            if len(rem) == 0:
                break
            if li == 0:
                h, s0, s1 = multihash_h0(rem)
            elif li == 1:
                h, s0, s1 = multihash_h1(s0, s1, rem)
            else:
                h, s0, s1 = multihash_next(s0, s1)
            n_bits = max(64, -(-int(gamma * len(rem)) // 64) * 64)
            pos = fast_range_64(h, U64(n_bits)).astype(np.int64)
            counts = np.bincount(pos, minlength=n_bits)
            singleton = counts[pos] == 1
            nw = n_bits // 64
            words = np.zeros(nw, dtype=np.uint64)
            spos = pos[singleton]
            np.bitwise_or.at(words, spos >> 6, U64(1) << (spos.astype(np.uint64) & U64(63)))
            levels.append((n_bits, words))
            keep = ~singleton
            rem, s0, s1 = rem[keep], s0[keep], s1[keep]

        # global rank samples per level (parity layout with C++ ranks)
        out_levels = []
        offset = 0
        for n_bits, words in levels:
            n_blocks = -(-n_bits // _BITS_PER_RANK_SAMPLE)
            pc = np.bitwise_count(words).astype(np.int64)
            wpb = _BITS_PER_RANK_SAMPLE // 64
            blk = pc.reshape(-1, wpb).sum(axis=1) if len(pc) % wpb == 0 else np.add.reduceat(
                pc, np.arange(0, len(pc), wpb)
            )
            ranks = (offset + np.concatenate([[0], np.cumsum(blk[:-1])])).astype(np.uint64)
            assert len(ranks) == n_blocks
            out_levels.append((n_bits, words, ranks))
            offset += int(pc.sum())
        last_bitset_rank = offset

        # leftovers -> final hash: sorted keys, values any bijection onto
        # [last_bitset_rank, n) — assign in sorted-key order for determinism
        fh_keys = np.sort(rem)
        fh_vals = np.arange(len(rem), dtype=np.uint64) + U64(last_bitset_rank)
        assert last_bitset_rank + len(rem) == n, "MPHF not minimal: duplicate keys?"
        return cls(
            n_elem=n,
            last_bitset_rank=last_bitset_rank,
            levels=out_levels,
            fh_keys=fh_keys,
            fh_vals=fh_vals,
            gamma=gamma,
        )

    # ----------------------------------------------------------------- query
    def lookup(self, keys) -> np.ndarray:
        """Host (NumPy) batched lookup; -1 for definite misses."""
        return np.asarray(boophf_lookup(self.device_arrays(), np.asarray(keys, dtype=np.uint64), np))

    def num_bits(self) -> int:
        nb = sum(64 * len(w) + 64 * len(r) for (_, w, r) in self.levels)
        return nb + 128 * len(self.fh_keys)

    def device_arrays(self) -> dict:
        """Pytree of flat arrays. Level word/rank arrays are concatenated;
        static per-level offsets ride along as a static pytree node. Each
        level's words are zero-padded to whole 512-bit rank blocks so the
        in-block scan never gathers out of bounds."""

        def padded(n_bits, w):
            n_blocks = -(-n_bits // _BITS_PER_RANK_SAMPLE)
            out = np.zeros(n_blocks * 8, dtype=np.uint64)
            out[: len(w)] = w
            return out

        words = (
            np.concatenate([padded(n, w) for (n, w, _) in self.levels])
            if self.levels
            else np.zeros(0, dtype=np.uint64)
        )
        ranks = np.concatenate([r for (_, _, r) in self.levels]) if self.levels else np.zeros(0, dtype=np.uint64)
        fh_keys = self.fh_keys
        if len(fh_keys) == 0:
            # keep searchsorted well-defined
            fh_keys = np.array([U64(0xFFFFFFFFFFFFFFFF)], dtype=np.uint64)
            fh_vals = np.array([U64(0)], dtype=np.uint64)
        else:
            fh_vals = self.fh_vals
        return {
            "words": words,
            "ranks": ranks,
            "fh_keys": fh_keys,
            "fh_vals": fh_vals,
            "meta": BooPHFMeta(
                n_bits=tuple(int(n) for (n, _, _) in self.levels),
                word_offsets=tuple(
                    int(x)
                    for x in np.cumsum(
                        [0]
                        + [
                            8 * (-(-n // _BITS_PER_RANK_SAMPLE))
                            for (n, _, _) in self.levels
                        ]
                    )[:-1]
                ),
                rank_offsets=tuple(
                    int(x) for x in np.cumsum([0] + [len(r) for (_, _, r) in self.levels])[:-1]
                ),
            ),
        }


@dataclass(frozen=True)
class BooPHFMeta:
    """Static (trace-time) level geometry. Registered as a static pytree node
    so a device-arrays dict containing it can cross jit boundaries."""

    n_bits: tuple
    word_offsets: tuple
    rank_offsets: tuple


try:  # register as static for jit; harmless if jax is unavailable
    import jax

    jax.tree_util.register_static(BooPHFMeta)
except Exception:  # pragma: no cover
    pass


def _level_rank(d: dict, meta: BooPHFMeta, li: int, pos, xp):
    """Rank (global, cross-level offset included) of ``pos`` within level li.

    Parity: reference src/pf1/boophf/mod.rs:250-267 — sampled every 512 bits
    + popcount scan of at most 7 preceding words + in-word mask popcount.
    """
    woff = meta.word_offsets[li]
    roff = meta.rank_offsets[li]
    word_idx = pos >> 6
    block = pos >> 9
    block_start = block << 3
    r = d["ranks"][roff + block].astype(xp.int64)
    for i in range(7):
        wid = block_start + i
        w = d["words"][woff + wid]
        use = wid < word_idx
        r = r + xp.where(use, _popcount(xp, w), xp.zeros_like(r))
    off = (pos & 63).astype(xp.uint64)
    mask = xp.where(
        off == 0, U64(0), (~U64(0)).astype(xp.uint64) >> (U64(64) - off)
    )
    r = r + _popcount(xp, d["words"][woff + word_idx] & mask)
    return r


def boophf_lookup(d: dict, keys, xp):
    """Batched MPHF lookup. Returns int64 values; -1 where the key is a
    definite miss (no level bit set and not in the final hash).

    For keys in the indexed set the value is exact; for foreign keys the
    result may be an arbitrary in-range value (classic MPHF contract,
    reference src/pf1/boophf/mod.rs:96-102).

    Optimization over the scalar reference: the level scan does only the
    bit test per level (1 gather); the 512-bit-block rank runs ONCE for
    the first-hit level using level offsets gathered from a tiny constant
    table, instead of per level.
    """
    meta: BooPHFMeta = d["meta"]
    keys = xp.asarray(keys)
    n_levels = len(meta.n_bits)
    if n_levels == 0:
        hit_level = xp.full(xp.shape(keys), -1, dtype=xp.int32)
        hit_pos = xp.zeros(xp.shape(keys), dtype=xp.int64)
    else:
        hit_level = None
        s0 = s1 = None
        for li in range(n_levels):
            if li == 0:
                h, s0, s1 = multihash_h0(keys)
            elif li == 1:
                h, s0, s1 = multihash_h1(s0, s1, keys)
            else:
                h, s0, s1 = multihash_next(s0, s1)
            pos = fast_range_64(h, U64(meta.n_bits[li])).astype(xp.int64)
            woff = meta.word_offsets[li]
            bit = (
                (d["words"][woff + (pos >> 6)] >> (pos.astype(xp.uint64) & U64(63)))
                & U64(1)
            ) != 0
            if hit_level is None:
                hit_level = xp.where(bit, xp.int32(0), xp.int32(-1))
                hit_pos = xp.where(bit, pos, xp.zeros_like(pos))
            else:
                newly = bit & (hit_level < 0)
                hit_level = xp.where(newly, xp.int32(li), hit_level)
                hit_pos = xp.where(newly, pos, hit_pos)

    # one rank for the hit level (dynamic level offsets from constant tables)
    lvl = xp.clip(hit_level, 0, max(n_levels - 1, 0))
    woff_t = xp.asarray(np.array(meta.word_offsets or (0,), dtype=np.int64))
    roff_t = xp.asarray(np.array(meta.rank_offsets or (0,), dtype=np.int64))
    wo = woff_t[lvl]
    ro = roff_t[lvl]
    word_idx = hit_pos >> 6
    block = hit_pos >> 9
    block_start = block << 3
    r = d["ranks"][ro + block].astype(xp.int64)
    for i in range(7):
        wid = block_start + i
        w = d["words"][wo + wid]
        use = wid < word_idx
        r = r + xp.where(use, _popcount(xp, w), xp.zeros_like(r))
    off = (hit_pos & 63).astype(xp.uint64)
    mask = xp.where(off == 0, U64(0), (~U64(0)).astype(xp.uint64) >> (U64(64) - off))
    r = r + _popcount(xp, d["words"][wo + word_idx] & mask)

    res = xp.where(hit_level >= 0, r, xp.full(xp.shape(keys), -1, dtype=xp.int64))

    # final hash (sorted keys + binary search) for level misses
    fhk = d["fh_keys"]
    idx = xp.searchsorted(fhk, keys)
    idx = xp.clip(idx, 0, len(fhk) - 1)
    fh_hit = (fhk[idx] == keys) & (hit_level < 0)
    res = xp.where(fh_hit, d["fh_vals"][idx].astype(xp.int64), res)
    return res
