"""Spectrum-preserving tiling ingestion from cuttlefish output.

One builder covering both reference variants (src/spt.rs = u64/pf1-encoded
table; src/spt_compact.rs = minimal-width piscem packing): occurrences are
collected once and exported to either table encoding.

Tiling semantics (reference src/spt.rs:96-131): a reference is a sequence
of tiles; consecutive unitigs overlap by k-1 bases, a polyN gap of n
advances the cursor by n (+k-1 if the previous tile was a unitig).
"""

from __future__ import annotations

import numpy as np

from ..bits.intvector import IntVector
from ..containers.refseq import RefSeqCollection
from ..containers.unitig_set import UnitigSet
from .unitig_table import (
    DenseUnitigTable,
    PiscemUnitigTable,
    encode_pf1,
    encode_piscem,
    required_num_bits,
)


class SPT:
    def __init__(self, unitigs: UnitigSet, ref_names, occ_uid, occ_ref, occ_pos, occ_o, ref_lens):
        self.unitigs = unitigs
        self.ref_names = list(ref_names)
        # occurrences grouped by unitig id, tiling order within a unitig
        order = np.argsort(occ_uid, kind="stable")
        self.occ_uid = occ_uid[order]
        self.occ_ref = occ_ref[order]
        self.occ_pos = occ_pos[order]
        self.occ_o = occ_o[order]
        self.ref_lens = np.asarray(ref_lens, dtype=np.int64)
        self.offsets = np.concatenate(
            [[0], np.cumsum(np.bincount(occ_uid, minlength=unitigs.n_unitigs))]
        ).astype(np.int64)

    @classmethod
    def from_cf(cls, cf_files) -> "SPT":
        from ..io.cuttlefish import iter_tiling

        unitigs, cfid2uid = UnitigSet.from_cf(cf_files)
        k = unitigs.k
        ref_names = []
        ref_lens = []
        uids, refs, poss, os_ = [], [], [], []
        for ref_id, (name, tokens) in enumerate(iter_tiling(cf_files)):
            ref_names.append(name)
            pos = 0
            prev_was_unitig = False
            for t in tokens:
                if not t.is_unitig:
                    pos += t.n
                    if prev_was_unitig:
                        pos += k - 1
                    prev_was_unitig = False
                else:
                    uid = cfid2uid[t.id]
                    ulen = int(unitigs.unitig_len(uid))
                    uids.append(uid)
                    refs.append(ref_id)
                    poss.append(pos)
                    os_.append(t.o)
                    pos += ulen - k + 1
                    prev_was_unitig = True
            ref_lens.append(pos + k - 1 if prev_was_unitig else pos)
        return cls(
            unitigs,
            ref_names,
            np.array(uids, dtype=np.int64),
            np.array(refs, dtype=np.int64),
            np.array(poss, dtype=np.int64),
            np.array(os_, dtype=np.int64),
            ref_lens,
        )

    @property
    def n_total_occs(self) -> int:
        return len(self.occ_uid)

    @property
    def k(self) -> int:
        return self.unitigs.k

    @property
    def num_refs(self) -> int:
        return len(self.ref_lens)

    def get_occ(self, uid: int, i: int):
        p = int(self.offsets[uid]) + i
        return (int(self.occ_ref[p]), int(self.occ_pos[p]), int(self.occ_o[p]))

    # ------------------------------------------------------------- exports
    def dense_table(self) -> DenseUnitigTable:
        """pf1-encoded u64 table (reference SPT / PufferfishDense path)."""
        ctable = encode_pf1(self.occ_ref, self.occ_pos, self.occ_o)
        return DenseUnitigTable(ctable, self.offsets, self.ref_names)

    def piscem_table(self) -> PiscemUnitigTable:
        """Minimal-width packed table (reference SPTCompact / piscem path)."""
        max_ref_len = int(self.ref_lens.max()) if len(self.ref_lens) else 1
        pos_bits, _ref_bits, total = required_num_bits(max_ref_len, self.num_refs)
        ref_shift = pos_bits + 1
        pos_mask = (1 << pos_bits) - 1
        words = encode_piscem(self.occ_ref, self.occ_pos, self.occ_o, ref_shift)
        ctable = IntVector.from_array(words, width=total)
        return PiscemUnitigTable(ctable, self.offsets, ref_shift, pos_mask, self.ref_names)

    def ref_seq_collection(self) -> RefSeqCollection:
        return RefSeqCollection.from_lens(self.ref_lens, self.ref_names)
