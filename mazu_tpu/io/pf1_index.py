"""Load pufferfish (C++) serialized indexes into ModIndex.

DenseIndex parity: reference src/pf1/dense_index.rs:33-97; SparseIndex:
reference src/pf1/sparse_index.rs:32-110.
"""

from __future__ import annotations

import numpy as np

from ..bits.bitvector import BitVector
from ..containers.refseq import RefSeqCollection
from ..containers.unitig_set import UnitigSet
from ..index.modindex import ModIndex
from ..index.unitig_table import DenseUnitigTable
from ..kphf.boophf import BooPHF
from ..kphf.pfhash import PFHash
from .pf1 import (
    PF1FilePaths,
    load_info_json,
    read_compact_bit_vector,
    read_compact_int_vector,
    read_compact_seq_vector,
    read_ctable,
    read_ref_accum_lens,
)
import os


def _load_unitig_set(files: PF1FilePaths, k: int) -> UnitigSet:
    useq = read_compact_seq_vector(files.seq)
    bv = read_compact_bit_vector(files.rank)
    # accum lens from unitig-end positions (reference src/pf1/dense_index.rs:54-66)
    ends = bv.select(np.arange(bv.count_ones()))
    accum = np.concatenate([[0], ends + 1]).astype(np.int64)
    return UnitigSet(k, useq, accum, bv=BitVector.from_set_positions(ends, len(useq)))


def _load_refs(files: PF1FilePaths, ref_names) -> RefSeqCollection:
    prefix_sum = read_ref_accum_lens(files.ref_accum_lens)
    seq = read_compact_seq_vector(files.ref_seq) if os.path.exists(files.ref_seq) else None
    return RefSeqCollection(seq, prefix_sum, ref_names)


def load_sparse_index(dirname: str) -> ModIndex:
    """Pufferfish sparse (sampled) index (reference src/pf1/sparse_index.rs:32-110)."""
    from ..kphf.sampled import SampledPFHash

    files = PF1FilePaths(dirname)
    info = load_info_json(files.info_json)
    assert info["sampling_type"] in ("sparse", "Sparse")

    unitigs = _load_unitig_set(files, info["k"])
    mphf = BooPHF.from_pf1(files.mphf)
    k2u = SampledPFHash(
        unitigs,
        mphf,
        sampled_pos=read_compact_int_vector(files.sample_pos),
        sampled_vec=read_compact_bit_vector(files.presence),
        canonical_vec=read_compact_bit_vector(files.canonical),
        direction_vec=read_compact_bit_vector(files.direction),
        ext_sizes=read_compact_int_vector(files.extension_lengths),
        ext_bases=read_compact_int_vector(files.extension_bases),
        sample_size=info["sample_size"],
        extension_size=info["extension_size"],
    )

    ref_names, ref_exts, ctable = read_ctable(files.ctable)
    offsets = read_compact_int_vector(files.ctg_offsets).to_array().astype(np.int64)
    u2pos = DenseUnitigTable(ctable, offsets, ref_names, ref_exts)
    refs = _load_refs(files, ref_names)
    return ModIndex(k2u, u2pos, refs, index_type="PF1Sparse", metadata=info)


def load_dense_index(dirname: str) -> ModIndex:
    files = PF1FilePaths(dirname)
    info = load_info_json(files.info_json)
    assert info["sampling_type"] in ("dense", "Dense")

    unitigs = _load_unitig_set(files, info["k"])
    mphf = BooPHF.from_pf1(files.mphf)
    pos = read_compact_int_vector(files.pos)
    assert len(pos) == unitigs.n_kmers, (len(pos), unitigs.n_kmers)
    k2u = PFHash(unitigs, mphf, pos)

    ref_names, ref_exts, ctable = read_ctable(files.ctable)
    offsets = read_compact_int_vector(files.ctg_offsets).to_array().astype(np.int64)
    u2pos = DenseUnitigTable(ctable, offsets, ref_names, ref_exts)

    refs = _load_refs(files, ref_names)
    return ModIndex(k2u, u2pos, refs, index_type="PF1Dense", metadata=info)
