"""SampledPFHash: pufferfish sparse index k-mer dictionary (load-only).

Parity: reference src/kphf/pfhash.rs:138-285. Only a sampled subset of
k-mers store explicit positions; an unsampled k-mer walks up to
``extension_size`` stored nucleotides toward its nearest sampled k-mer,
re-hashes, and shifts the sampled position back.

The walk is a fixed ``extension_size``-step predicated loop (static bound
from info.json), so the whole query stays one batched jit pipeline.
"""

from __future__ import annotations

import numpy as np

from ..bits.bitvector import BitVector, bv_get_bit, bv_rank
from ..bits.intvector import IntVector, iv_get
from ..containers.unitig_set import UnitigSet, us_get_kmer, us_is_valid_pos
from ..kmer import mask2k, revcomp, word_equivalency
from ..pytree import meta
from .boophf import BooPHF, boophf_lookup

U64 = np.uint64


class SampledPFHash:
    def __init__(
        self,
        unitigs: UnitigSet,
        mphf: BooPHF,
        sampled_pos: IntVector,
        sampled_vec: BitVector,
        canonical_vec: BitVector,
        direction_vec: BitVector,
        ext_sizes: IntVector,
        ext_bases: IntVector,
        sample_size: int,
        extension_size: int,
    ):
        self.unitigs = unitigs
        self.mphf = mphf
        self.sampled_pos = sampled_pos
        self.sampled_vec = sampled_vec
        self.canonical_vec = canonical_vec
        self.direction_vec = direction_vec
        self.ext_sizes = ext_sizes
        self.ext_bases = ext_bases
        self.sample_size = int(sample_size)
        self.extension_size = int(extension_size)

    @property
    def k(self) -> int:
        return self.unitigs.k

    @property
    def n_kmers(self) -> int:
        return self.unitigs.n_kmers

    def device_arrays(self) -> dict:
        return {
            "us": self.unitigs.device_arrays(),
            "mphf": self.mphf.device_arrays(),
            "sampled_pos": self.sampled_pos.device_arrays(),
            "sampled_vec": self.sampled_vec.device_arrays(),
            "canonical_vec": self.canonical_vec.device_arrays(),
            "direction_vec": self.direction_vec.device_arrays(),
            "ext_sizes": self.ext_sizes.device_arrays(),
            "ext_bases": self.ext_bases.device_arrays(),
            "meta": meta(
                kind="sampled",
                k=self.unitigs.k,
                sample_size=self.sample_size,
                extension_size=self.extension_size,
            ),
        }


def _append_base(fw, rc, code, k):
    """CanonicalKmer::append_base: drop first base, append ``code`` at the
    end (LSB-first: end == high bits)."""
    m = mask2k(k)
    fw2 = ((fw >> U64(2)) | (code << U64(2 * (k - 1)))) & m
    rc2 = ((rc << U64(2)) | (code ^ U64(3))) & m
    return fw2, rc2


def _prepend_base(fw, rc, code, k):
    m = mask2k(k)
    fw2 = ((fw << U64(2)) | code) & m
    rc2 = ((rc >> U64(2)) | ((code ^ U64(3)) << U64(2 * (k - 1)))) & m
    return fw2, rc2


def _verify_at(d, fw, rc, pos, xp):
    """k2u_w_pos (reference src/kphf/pfhash.rs:263-285)."""
    us = d["us"]
    k = d["meta"].k
    pos_c = xp.clip(pos, 0, max(us["meta"].total_len - k, 0))
    kw = us_get_kmer(us, pos_c, xp)
    mt = word_equivalency(fw, rc, kw, k)
    uid = bv_rank(us["bv"], pos_c, xp)
    start = us["accum"][uid]
    return {
        "unitig_id": uid,
        "unitig_len": us["accum"][uid + 1] - start,
        "pos": pos_c - start,
        "mt": mt,
    }


def sampled_k2u(d: dict, fw_words, xp):
    """Batched SampledPFHash k2u (reference src/kphf/pfhash.rs:190-259)."""
    m = d["meta"]
    k = m.k
    ext_n = m.extension_size
    fw = xp.asarray(fw_words)
    rc = revcomp(fw, k)
    canon = xp.minimum(fw, rc)

    h = boophf_lookup(d["mphf"], canon, xp)
    miss = h < 0
    hc = xp.clip(h, 0, None)
    is_sampled = bv_get_bit(d["sampled_vec"], hc, xp)
    rank_h = bv_rank(d["sampled_vec"], hc, xp)
    n_sampled = d["sampled_pos"]["meta"].length

    # ---- sampled path
    pos_sampled = iv_get(
        d["sampled_pos"], xp.clip(rank_h, 0, n_sampled - 1), xp
    ).astype(xp.int64)

    # ---- unsampled path: walk extension bases toward the sampled k-mer
    ext_pos = hc - rank_h
    n_ext = d["ext_sizes"]["meta"].length
    ext_pos_c = xp.clip(ext_pos, 0, max(n_ext - 1, 0))
    ext_word = iv_get(d["ext_bases"], ext_pos_c, xp)
    ext_size = iv_get(d["ext_sizes"], ext_pos_c, xp).astype(xp.int64)
    canonical_bit = bv_get_bit(d["canonical_vec"], ext_pos_c, xp)
    shift_fw = bv_get_bit(d["direction_vec"], ext_pos_c, xp)

    # orientation fix: XOR of (stored canonical flag) and (query fw-canonical)
    is_fw_canon = fw <= rc
    do_swap = (~canonical_bit) ^ (~is_fw_canon)
    wfw = xp.where(do_swap, rc, fw)
    wrc = xp.where(do_swap, fw, rc)

    llimit = ext_n - (ext_size + 1)
    signed_shift = xp.zeros(xp.shape(fw), dtype=xp.int64)
    for i in range(ext_n, 0, -1):  # i = extension_size .. 1 (descending)
        apply = (i > llimit) & (~is_sampled)
        code = (ext_word >> U64(2 * (i - 1))) & U64(3)
        afw, arc = _append_base(wfw, wrc, code, k)
        pfw, prc = _prepend_base(wfw, wrc, code, k)
        nfw = xp.where(shift_fw, afw, pfw)
        nrc = xp.where(shift_fw, arc, prc)
        wfw = xp.where(apply, nfw, wfw)
        wrc = xp.where(apply, nrc, wrc)
        step = xp.where(shift_fw, xp.int64(-1), xp.int64(1))
        signed_shift = signed_shift + xp.where(apply, step, xp.zeros_like(step))

    canon2 = xp.minimum(wfw, wrc)
    h2 = boophf_lookup(d["mphf"], canon2, xp)
    h2c = xp.clip(h2, 0, None)
    sampled2 = bv_get_bit(d["sampled_vec"], h2c, xp) & (h2 >= 0)
    rank2 = bv_rank(d["sampled_vec"], h2c, xp)
    sample_pos2 = iv_get(
        d["sampled_pos"], xp.clip(rank2, 0, n_sampled - 1), xp
    ).astype(xp.int64)
    pos_unsampled = sample_pos2 + signed_shift
    pos_ok = sampled2 & us_is_valid_pos(d["us"], pos_unsampled, xp)

    pos = xp.where(is_sampled, pos_sampled, pos_unsampled)
    ok = (~miss) & (is_sampled | pos_ok)
    r = _verify_at(d, fw, rc, pos, xp)
    r["mt"] = xp.where(ok, r["mt"], xp.zeros_like(r["mt"]))
    return r
