"""Color classes: unitig -> deduplicated set of reference ids.

The reference RESERVES this capability — ``// pub mod cc_index;``
(src/lib.rs:26) plus the unused ``test_data/color_classes/`` fixtures —
but never implements it. This is the pufferfish/themisto-style color
layer built from the U2Pos occurrence table: a unitig's *color set* is
the set of distinct references it occurs in; identical sets are
deduplicated into *classes* (transcriptomes share most sets across
isoforms, so n_classes << n_unitigs).

Layout (flat device arrays): ``u2c`` int32[n_unitigs] class ids,
``offsets`` int64[n_classes+1] CSR prefix, ``refs`` int32[total] sorted
ref ids per class. Query = k2u + 1 element gather (u2c) + CSR window
(2 consecutive gathers) + one wide row gather of the class's refs —
the same gather-count discipline as the occurrence projection.
"""

from __future__ import annotations

import numpy as np

from .modindex import k2u_batch
from ..pytree import meta


class ColorClasses:
    def __init__(self, u2c, offsets, refs, n_refs: int):
        self.u2c = np.asarray(u2c, dtype=np.int32)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.refs = np.asarray(refs, dtype=np.int32)
        self.n_refs = int(n_refs)

    # ------------------------------------------------------------- build
    @classmethod
    def from_u2pos(cls, table) -> "ColorClasses":
        """Host build from any U2Pos table (Dense/Piscem/WM encodings via
        ``decode_occs``). Vectorized decode + per-unitig dedup; class
        dedup is an exact bytes-keyed grouping."""
        from .unitig_table import decode_occs

        n = table.n_unitigs
        offsets = np.asarray(table.offsets, dtype=np.int64)
        total = int(offsets[-1])
        d = table.device_arrays(paired=False)
        ref_id, _, _ = decode_occs(d, np.arange(total, dtype=np.int64), np)
        uid = (
            np.searchsorted(offsets, np.arange(total, dtype=np.int64), side="right")
            - 1
        )
        n_refs = int(ref_id.max()) + 1 if total else 0
        # distinct sorted (uid, ref) pairs
        key = uid * np.int64(max(n_refs, 1)) + ref_id
        key = np.unique(key)
        p_uid = key // max(n_refs, 1)
        p_ref = (key % max(n_refs, 1)).astype(np.int32)
        bounds = np.searchsorted(p_uid, np.arange(n + 1, dtype=np.int64))
        classes: dict[bytes, int] = {}
        u2c = np.zeros(n, dtype=np.int32)
        class_rows: list[np.ndarray] = []
        for u in range(n):
            row = p_ref[bounds[u] : bounds[u + 1]]
            bkey = row.tobytes()
            cid = classes.get(bkey)
            if cid is None:
                cid = len(class_rows)
                classes[bkey] = cid
                class_rows.append(row)
            u2c[u] = cid
        lens = np.array([len(r) for r in class_rows], dtype=np.int64)
        coff = np.zeros(len(class_rows) + 1, dtype=np.int64)
        np.cumsum(lens, out=coff[1:])
        refs = (
            np.concatenate(class_rows)
            if class_rows
            else np.zeros(0, dtype=np.int32)
        )
        return cls(u2c, coff, refs, n_refs)

    # ------------------------------------------------------------ access
    @property
    def n_classes(self) -> int:
        return len(self.offsets) - 1

    @property
    def n_unitigs(self) -> int:
        return len(self.u2c)

    def class_of(self, uid) -> np.ndarray:
        return self.u2c[np.asarray(uid, dtype=np.int64)]

    def refs_of_class(self, cid: int) -> np.ndarray:
        s, e = int(self.offsets[cid]), int(self.offsets[cid + 1])
        return self.refs[s:e]

    def max_class_size(self) -> int:
        if self.n_classes == 0:
            return 0
        return int(np.max(self.offsets[1:] - self.offsets[:-1]))

    def num_bits(self) -> int:
        return 8 * (self.u2c.nbytes + self.offsets.nbytes + self.refs.nbytes)

    def print_stats(self) -> None:
        print(f"color classes: {self.n_classes} over {self.n_unitigs} unitigs")
        print(f"  total class-refs: {len(self.refs)}")
        print(f"  bits/unitig: {self.num_bits()/max(1,self.n_unitigs):.2f}")

    # ------------------------------------------------------------ device
    def device_arrays(self) -> dict:
        return {
            "u2c": self.u2c,
            "offsets": self.offsets,
            "refs": np.concatenate(
                [self.refs, np.zeros(1, dtype=np.int32)]
            ),  # pad for clipped windows
            "meta": meta(
                n_classes=self.n_classes,
                n_unitigs=self.n_unitigs,
                n_refs=self.n_refs,
                max_class_size=self.max_class_size(),
            ),
        }

    # ---------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            u2c=self.u2c,
            offsets=self.offsets,
            refs=self.refs,
            n_refs=np.int64(self.n_refs),
        )

    @classmethod
    def load(cls, path: str) -> "ColorClasses":
        z = np.load(path)
        return cls(z["u2c"], z["offsets"], z["refs"], int(z["n_refs"]))


def colors_lookup(cc: dict, uid, xp, max_refs: int):
    """Class id + padded ref-id rows for unitig ids (device kernel)."""
    uid = xp.asarray(uid)
    cid = cc["u2c"][uid].astype(xp.int64)
    start = cc["offsets"][cid]
    cnt = cc["offsets"][cid + 1] - start
    j = xp.arange(max_refs, dtype=xp.int64)
    idx = xp.clip(start[:, None] + j[None, :], 0, cc["refs"].shape[0] - 1)
    refs = cc["refs"][idx]
    valid = j[None, :] < cnt[:, None]
    return cid, xp.where(valid, refs, xp.zeros_like(refs)), valid, cnt


def colors_batch(index_arrays: dict, cc: dict, fw_words, xp, max_refs: int):
    """Batched k-mer -> color query: k2u + colors_lookup, miss-safe."""
    r = k2u_batch(index_arrays, fw_words, xp)
    return colors_from_k2u(cc, r, xp, max_refs)


def colors_from_k2u(cc: dict, r: dict, xp, max_refs: int):
    """Color resolution over per-lane k2u fields (unitig_id, mt) — the
    back half of colors_batch, split out so SHARDED deployments can run
    it over merged sharded-query outputs: the cc arrays are small
    (deduplicated classes) and REPLICATE across shards, so colors are an
    elementwise per-lane pass once the k2u answer is merged
    (validate.merge_sharded_out of a make_*_sharded_query result)."""
    hit = r["mt"] > 0
    uid = xp.where(hit, r["unitig_id"], xp.zeros_like(r["unitig_id"]))
    cid, refs, valid, cnt = colors_lookup(cc, uid, xp, max_refs)
    z64 = xp.zeros_like(cid)
    return {
        "mt": r["mt"],
        "unitig_id": r["unitig_id"],
        "class_id": xp.where(hit, cid, z64 - 1),
        "refs": xp.where(hit[:, None], refs, xp.zeros_like(refs)),
        "valid": valid & hit[:, None],
        "n_refs": xp.where(hit, cnt, z64),
    }
