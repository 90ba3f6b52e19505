"""SampledPFHash: pufferfish sparse index k-mer dictionary.

Parity: reference src/kphf/pfhash.rs:138-285. Only a sampled subset of
k-mers store explicit positions; an unsampled k-mer walks up to
``extension_size`` stored nucleotides toward its nearest sampled k-mer,
re-hashes, and shifts the sampled position back.

The walk is a fixed ``extension_size``-step predicated loop (static bound
from info.json), so the whole query stays one batched jit pipeline.

``from_unitig_set`` BUILDS the sparse structure (the reference leaves this
``todo!()`` at src/kphf/pfhash.rs:160-162 — load-only there); the build
here inverts the query-walk semantics, so any structure it produces is
validated by the same batched ``sampled_k2u`` the pf1 C++ fixtures load
into.
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

    @classmethod
    def from_unitig_set(
        cls,
        unitigs: UnitigSet,
        sample_size: int = 9,
        extension_size: int = 4,
        gamma: float = 1.7,
    ) -> "SampledPFHash":
        """Build the sparse pufferfish dictionary (reference ``todo!()``,
        src/kphf/pfhash.rs:160-162).

        Sampling rule: on each unitig, local k-mer positions ``lp`` with
        ``lp % sample_size == 0`` are sampled, plus the unitig's LAST k-mer
        when its phase exceeds ``extension_size`` (tail coverage). With
        ``sample_size <= 2*extension_size + 1`` every unsampled k-mer is
        within ``extension_size`` useq steps of a sample in one direction:
        phase <= E walks backward, phase > E walks forward (to the next
        multiple, or the extra-sampled last k-mer at the unitig tail).
        """
        k, s, E = unitigs.k, int(sample_size), int(extension_size)
        assert 1 <= s <= 2 * E + 1, "unsampled k-mers must be within one walk"
        n = unitigs.n_kmers
        starts = unitigs.accum[:-1]
        npos = (unitigs.accum[1:] - starts) - k + 1  # k-mers per unitig
        p = unitigs.kmer_start_positions().astype(np.int64)
        uid = np.repeat(np.arange(unitigs.n_unitigs, dtype=np.int64), npos)
        lp = p - starts[uid]
        last = npos[uid] - 1
        d = lp % s
        dL = last % s
        sampled = (d == 0) | ((lp == last) & (dL > E))

        # signed useq distance to the walk target (0 for sampled k-mers)
        t_fwd = np.minimum(lp - d + s, last)  # next multiple, or tail sample
        target = np.where(d > E, t_fwd, lp - d)
        delta = np.where(sampled, 0, target - lp)
        steps = np.abs(delta)
        assert int(steps.max(initial=0)) <= E

        fw = unitigs.get_kmer_u64(p)
        rc = revcomp(fw, k)
        canon = np.minimum(fw, rc)
        mphf = BooPHF.build(canon, gamma=gamma)
        h = np.asarray(mphf.lookup(canon)).astype(np.int64)
        assert (h >= 0).all() and len(np.unique(h)) == n

        bits = np.zeros(n, dtype=bool)
        bits[h[sampled]] = True
        rank_excl = np.cumsum(bits) - bits  # ones strictly before each slot

        n_sampled = int(sampled.sum())
        pos_by_rank = np.zeros(n_sampled, dtype=np.int64)
        pos_by_rank[rank_excl[h[sampled]]] = p[sampled]

        uns = ~sampled
        e_idx = h[uns] - rank_excl[h[uns]]  # compressed unsampled index
        n_uns = n - n_sampled
        canonical_arr = np.zeros(n_uns, dtype=bool)
        direction_arr = np.zeros(n_uns, dtype=bool)
        sizes_arr = np.zeros(n_uns, dtype=np.int64)
        bases_arr = np.zeros(n_uns, dtype=np.uint64)
        if n_uns:
            canonical_arr[e_idx] = (fw <= rc)[uns]
            fwd = delta[uns] > 0
            direction_arr[e_idx] = fwd
            sizes_arr[e_idx] = steps[uns] - 1
            # extension bases, high-to-low: step j's code at shift 2*(E-1-j).
            # forward walk appends bases p+k+j; backward prepends p-1-j.
            j = np.arange(E, dtype=np.int64)[None, :]
            pu = p[uns][:, None]
            bp = np.where(fwd[:, None], pu + k + j, pu - 1 - j)
            mask = j < steps[uns][:, None]
            bp = np.clip(bp, 0, unitigs.total_len - 1)
            codes = unitigs.useq.get_base(bp.reshape(-1)).reshape(bp.shape)
            word = (
                codes.astype(np.uint64) << np.uint64(2) * (E - 1 - j).astype(np.uint64)
            ) * mask
            bases_arr[e_idx] = word.sum(axis=1, dtype=np.uint64)

        return cls(
            unitigs,
            mphf,
            sampled_pos=IntVector.from_array(pos_by_rank.astype(np.uint64)),
            sampled_vec=BitVector.from_bools(bits),
            canonical_vec=BitVector.from_bools(canonical_arr),
            direction_vec=BitVector.from_bools(direction_arr),
            ext_sizes=IntVector.from_array(
                sizes_arr.astype(np.uint64), width=max(1, (E - 1).bit_length())
            ),
            ext_bases=IntVector.from_array(bases_arr, width=2 * E),
            sample_size=s,
            extension_size=E,
        )

    def print_stats(self, log=print) -> None:
        n = max(1, self.n_kmers)
        log(f"sampled_pos: {self.sampled_pos.length} entries")
        log(f"sample_size: {self.sample_size}  extension_size: {self.extension_size}")
        log(f"total: {self.num_bits() / n:.2f} bits per kmer")

    def num_bits(self) -> int:
        """Stats parity: total structure size (reference print_stats)."""
        bv_bits = lambda b: len(b.words) * 64  # noqa: E731
        iv_bits = lambda v: len(v.words) * 64  # noqa: E731
        return (
            self.unitigs.num_bits()
            + self.mphf.num_bits()
            + iv_bits(self.sampled_pos)
            + bv_bits(self.sampled_vec)
            + bv_bits(self.canonical_vec)
            + bv_bits(self.direction_vec)
            + iv_bits(self.ext_sizes)
            + iv_bits(self.ext_bases)
        )

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
