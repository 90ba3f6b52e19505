"""PFHash: pufferfish-style dense k-mer dictionary.

MPHF over ALL canonical k-mers + a position vector (reference
src/kphf/pfhash.rs:19-73). Query: canonical word -> MPHF -> pos[h] -> fetch
k-mer at that useq position -> equivalency check -> unitig mapping
(reference src/kphf/pfhash.rs:108-134), fully batched on device.
"""

from __future__ import annotations

import numpy as np

from ..bits.intvector import IntVector, iv_get
from ..bits.bitvector import bv_rank
from ..containers.unitig_set import UnitigSet, us_get_kmer
from ..kmer import canonicalize, revcomp, word_equivalency
from ..pytree import meta
from .boophf import BooPHF


class PFHash:
    def __init__(self, unitigs: UnitigSet, mphf: BooPHF, pos: IntVector):
        self.unitigs = unitigs
        self.mphf = mphf
        self.pos = pos

    @classmethod
    def from_unitig_set(
        cls, unitigs: UnitigSet, gamma: float = 1.7, engine: str = "parity"
    ) -> "PFHash":
        """Build: BBHash over all canonical k-mers, then scatter global k-mer
        start positions by hash value (reference src/kphf/pfhash.rs:40-73,
        with the rayon scatter replaced by a vectorized permutation).
        ``engine="fast32"`` uses the 32-bit BooPHF32."""
        kpos = unitigs.kmer_start_positions()
        words = unitigs.get_kmer_u64(kpos)
        canon, _, _ = canonicalize(words, unitigs.k)
        if engine == "fast32":
            from .boophf32 import BooPHF32

            mphf = BooPHF32.build(canon, gamma=gamma)
        else:
            mphf = BooPHF.build(canon, gamma=gamma)
        h = mphf.lookup(canon)
        assert (h >= 0).all()
        posv = np.zeros(len(kpos), dtype=np.uint64)
        posv[h] = kpos.astype(np.uint64)
        return cls(unitigs, mphf, IntVector.from_array(posv))

    @property
    def k(self) -> int:
        return self.unitigs.k

    @property
    def n_kmers(self) -> int:
        return self.unitigs.n_kmers

    def num_bits(self) -> int:
        return self.unitigs.num_bits() + self.mphf.num_bits() + self.pos.num_bits()

    def device_arrays(self) -> dict:
        return {
            "us": self.unitigs.device_arrays(),
            "mphf": self.mphf.device_arrays(),
            "pos": self.pos.device_arrays(),
            "meta": meta(kind="pfhash", k=self.unitigs.k),
        }


def pfhash_k2u(d: dict, fw_words, xp):
    """Batched k2u. Input: k-mer words in query (fw) orientation.

    Returns dict of arrays: unitig_id, unitig_len, pos (on unitig), and
    mt (1=identity, 2=twin, 0=miss) — the batched K2UPos
    (reference src/kphf/mod.rs:13-19).
    """
    from .sshash import mphf_lookup

    us = d["us"]
    k = d["meta"].k
    fw = xp.asarray(fw_words)
    rc = revcomp(fw, k)
    canon = xp.minimum(fw, rc)

    h = mphf_lookup(d["mphf"], canon, xp).astype(xp.int64)
    hc = xp.clip(h, 0, d["pos"]["meta"].length - 1)
    km_pos = iv_get(d["pos"], hc, xp).astype(xp.int64)
    km_pos = xp.clip(km_pos, 0, us["meta"].total_len - k)
    kw = us_get_kmer(us, km_pos, xp)
    mt = word_equivalency(fw, rc, kw, k)
    mt = xp.where(h < 0, xp.zeros_like(mt), mt)

    uid = bv_rank(us["bv"], km_pos, xp)
    start = us["accum"][uid]
    ulen = us["accum"][uid + 1] - start
    upos = km_pos - start
    return {"unitig_id": uid, "unitig_len": ulen, "pos": upos, "mt": mt}
