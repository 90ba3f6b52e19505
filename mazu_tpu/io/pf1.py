"""Readers for pufferfish (C++) serialized index files ("pf1" format).

Byte-parity with the formats consumed by reference src/pf1/cpp.rs:
- sdsl "compact" IntVector: <static_flag u64><width u64><len u64><capacity
  u64><words u64...> (reference src/pf1/cpp.rs:217-237)
- cereal archives: length-prefixed vectors of strings / u32 / u64
  (reference src/pf1/cpp.rs:124-172)
- BooPHF binary (reference src/pf1/boophf/mod.rs:50-93)

All integers are little-endian (x86-produced files, "native-endian").
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ..bits.bitvector import BitVector
from ..bits.intvector import IntVector
from ..bits.seqvector import SeqVector

# file name constants (reference src/pf1/mod.rs:116-138)
FP = dict(
    COMPLETE_REF_LENS="complete_ref_lens.bin",
    CTABLE="ctable.bin",
    CTG_OFFSETS="ctg_offsets.bin",
    DUPLICATE_CLUSTERS_TSV="duplicate_clusters.tsv",
    INFO_JSON="info.json",
    MPHF="mphf.bin",
    POS="pos.bin",
    SAMPLE_POS="sample_pos.bin",
    PRESENCE="presence.bin",
    EXTENSION_LENGTHS="extensionSize.bin",
    EXTENSION_BASES="extension.bin",
    DIRECTION="direction.bin",
    CANONICAL="canonical.bin",
    RANK="rank.bin",
    REF_ACCUM_LENS="refAccumLengths.bin",
    REF_INDEXING_LOG="ref_indexing.log",
    REF_LENS="reflengths.bin",
    REF_SEQ="refseq.bin",
    SEQ="seq.bin",
)


class PF1FilePaths:
    """Paths of all pufferfish index files in a directory
    (reference src/pf1/mod.rs:41-115)."""

    def __init__(self, dirname: str):
        self.prefix = dirname
        for attr, fname in FP.items():
            setattr(self, attr.lower(), os.path.join(dirname, fname))


from ..err import TruncatedFile  # noqa: F401  (canonical home: err.py)


def _read_exact(f, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise TruncatedFile(f"expected {n} bytes, got {len(b)}")
    return b


def read_u64(f) -> int:
    return int.from_bytes(_read_exact(f, 8), "little")


def read_i32(f) -> int:
    return int.from_bytes(_read_exact(f, 4), "little", signed=True)


def read_f64(f) -> float:
    return np.frombuffer(_read_exact(f, 8), dtype="<f8")[0]


def read_u64_array(f, n: int) -> np.ndarray:
    return np.frombuffer(_read_exact(f, 8 * n), dtype="<u8").copy()


def read_compact_int_vector(path: str) -> IntVector:
    """sdsl compact IntVector file -> IntVector (reference src/pf1/cpp.rs:217-237)."""
    with open(path, "rb") as f:
        _static_flag = read_u64(f)
        width = read_u64(f)
        assert width > 0
        length = read_u64(f)
        _capacity = read_u64(f)
        words = np.frombuffer(f.read(), dtype="<u8").copy()
    return IntVector(words, length, width)


def read_compact_bit_vector(path: str) -> BitVector:
    iv = read_compact_int_vector(path)
    return BitVector(iv.words, iv.length * iv.width)


def read_compact_seq_vector(path: str) -> SeqVector:
    iv = read_compact_int_vector(path)
    assert iv.width == 2, f"seq width {iv.width} != 2"
    return SeqVector(iv.words, iv.length)


def get_bits_per_element(path: str) -> int:
    with open(path, "rb") as f:
        _ = read_u64(f)
        return read_u64(f)


def read_cereal_string_vec(f) -> list[str]:
    n = read_u64(f)
    out = []
    for _ in range(n):
        ln = read_u64(f)
        out.append(f.read(ln).decode())
    return out


def read_cereal_u32_vec(f) -> np.ndarray:
    n = read_u64(f)
    return np.frombuffer(f.read(4 * n), dtype="<u4").copy()


def read_cereal_u64_vec(f) -> np.ndarray:
    n = read_u64(f)
    return read_u64_array(f, n)


@dataclass
class RawBooPHF:
    """Parsed BooPHF.hpp serialization (reference src/pf1/boophf/mod.rs:50-93)."""

    gamma: float
    last_bitset_rank: int
    n_elem: int
    # per level: (n_bits, words u64[], ranks u64[])  (ranks sampled every 512
    # bits, offset by the total rank of preceding levels)
    levels: list = field(default_factory=list)
    final_hash: dict = field(default_factory=dict)


def read_boophf(path: str) -> RawBooPHF:
    with open(path, "rb") as f:
        gamma = read_f64(f)
        nb_levels = read_i32(f)
        last_bitset_rank = read_u64(f)
        n_elem = read_u64(f)
        levels = []
        for _ in range(nb_levels):
            n_bits = read_u64(f)
            n_words = read_u64(f)
            # C++ allocates n_bits/64 + 1 words; truncate to ceil(n_bits/64)
            words = read_u64_array(f, n_words)[: (n_bits + 63) // 64]
            ranks_size = read_u64(f)
            ranks = read_u64_array(f, ranks_size)
            levels.append((n_bits, words, ranks))
        final_hash_size = read_u64(f)
        final_hash = {}
        for _ in range(final_hash_size):
            k = read_u64(f)
            v = read_u64(f)
            assert k not in final_hash
            final_hash[k] = v
    return RawBooPHF(gamma, last_bitset_rank, n_elem, levels, final_hash)


def load_info_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def read_ctable(path: str):
    """ctable.bin: three cereal archives (ref_names, ref_exts, ctable u64)
    (reference src/pf1/unitig_table.rs:28-49)."""
    with open(path, "rb") as f:
        ref_names = read_cereal_string_vec(f)
        ref_exts = read_cereal_u32_vec(f)
        ctable = read_cereal_u64_vec(f)
        assert f.read() == b"", "trailing bytes in ctable.bin"
    return ref_names, ref_exts, ctable


def read_ref_accum_lens(path: str) -> np.ndarray:
    """refAccumLengths.bin -> prefix sum with prepended 0
    (reference src/pf1/mod.rs:226-231)."""
    with open(path, "rb") as f:
        v = read_cereal_u64_vec(f)
    return np.concatenate([[0], v]).astype(np.int64)
