"""Validation harness — the correctness oracle.

Parity with reference src/index/validate.rs: every k-mer of every indexed
reference must project back to its true (ref_id, pos); external FASTA
validation k-merizes reads with non-ACGT restart semantics
(CanonicalKmerIterator analog). Batched: the whole reference is queried in
vectorized chunks instead of a scalar loop.
"""

from __future__ import annotations

import numpy as np

from .. import MATCH_IDENTITY, MATCH_TWIN
from ..kmer import seq_to_codes
from .modindex import ModIndex, get_ref_pos_padded


def _check_chunk(out, ref_id: int, positions: np.ndarray, label: str):
    found = (
        (out["valid"])
        & (out["ref_id"] == ref_id)
        & (out["ref_pos"] == positions[:, None])
    ).any(axis=1)
    if not found.all():
        bad = int(np.flatnonzero(~found)[0])
        raise AssertionError(
            f"{label}: no matching MappedRefPos for true +ve k-mer in ref "
            f"{ref_id} @ pos {int(positions[bad])} (mt={int(out['mt'][bad])})"
        )


def validate_self(index: ModIndex, query_fn=None, chunk: int = 1 << 14):
    """Walk the index's own references (reference src/index/validate.rs:24-52)."""
    assert index.refs.has_seq, "validate_self requires reference sequences"
    arrays = index.device_arrays()
    max_occs = max(1, index.max_occs())
    k = index.k
    for ri in range(index.n_refs):
        kms = index.refs.ref_kmers(ri, k)
        for s in range(0, len(kms), chunk):
            part = kms[s : s + chunk]
            if query_fn is not None:
                out = {kk: np.asarray(v) for kk, v in query_fn(part).items()}
            else:
                out = get_ref_pos_padded(arrays, part, np, max_occs)
            _check_chunk(out, ri, np.arange(s, s + len(part)), "validate_self")


def windows_from_codes(codes: np.ndarray, k: int):
    """(positions, fw_words) of all k-mer windows of valid codes (< 4) —
    the CanonicalKmerIterator contract (skip + restart at invalid bases)."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    bad = (codes > 3).astype(np.int64)
    cbad = np.concatenate([[0], np.cumsum(bad)])
    pos = np.arange(n - k + 1, dtype=np.int64)
    ok = (cbad[pos + k] - cbad[pos]) == 0
    pos = pos[ok]
    words = np.zeros(len(pos), dtype=np.uint64)
    c = np.where(codes > 3, 0, codes).astype(np.uint64)
    for i in range(k):
        words |= c[pos + i] << np.uint64(2 * i)
    return pos, words


def valid_kmer_windows(seq: str | bytes, k: int):
    """(positions, fw_words) of all all-ACGT k-mer windows of an ASCII read.
    Uses the native C++ k-merizer when available (15x faster ingestion)."""
    from ..io import native

    if native.have_native():
        return native.kmerize(native.seq_to_codes(seq), k)
    return windows_from_codes(seq_to_codes(seq), k)


def validate_ckmers(index: ModIndex, ref_id: int, seq: str, query_fn=None, chunk: int = 1 << 14):
    """Validate all valid k-mers of one external sequence
    (reference src/index/validate.rs:55-81)."""
    positions, words = valid_kmer_windows(seq, index.k)
    arrays = index.device_arrays()
    max_occs = max(1, index.max_occs())
    for s in range(0, len(words), chunk):
        part = words[s : s + chunk]
        if query_fn is not None:
            out = {kk: np.asarray(v) for kk, v in query_fn(part).items()}
        else:
            out = get_ref_pos_padded(arrays, part, np, max_occs)
        _check_chunk(out, ref_id, positions[s : s + chunk], "validate_ckmers")


def validate_fasta(index: ModIndex, path: str, query_fn=None):
    """Validate against a FASTA file (reference src/index/validate.rs:83-100)."""
    from ..io.fasta import read_fasta

    for ri, (_name, seq) in enumerate(read_fasta(path)):
        validate_ckmers(index, ri, seq, query_fn=query_fn)


def validate_k2u_self(k2u, k2u_fn=None, chunk: int = 1 << 14):
    """Dictionary-level self validation (reference src/kphf/mod.rs:69-103):
    every unitig k-mer, fw and rc, must return its exact K2UPos."""
    from ..kmer import revcomp

    us = k2u.unitigs
    k = us.k
    pos = us.kmer_start_positions()
    uid_true = us.pos_to_id(pos)
    upos_true = pos - us.accum[uid_true]
    ulen_true = us.unitig_len(uid_true)
    fw = us.get_kmer_u64(pos)
    d = k2u.device_arrays()
    if k2u_fn is None:
        from .modindex import k2u_batch

        k2u_fn = lambda w: k2u_batch({"k2u": d}, w, np)  # noqa: E731

    for s in range(0, len(pos), chunk):
        sl = slice(s, s + chunk)
        for words, want_mt in ((fw[sl], MATCH_IDENTITY), (revcomp(fw[sl], k), MATCH_TWIN)):
            r = {kk: np.asarray(v) for kk, v in k2u_fn(words).items()}
            ok = (
                (r["mt"] == want_mt)
                & (r["unitig_id"] == uid_true[sl])
                & (r["pos"] == upos_true[sl])
                & (r["unitig_len"] == ulen_true[sl])
            )
            if not ok.all():
                bad = int(np.flatnonzero(~ok)[0])
                raise AssertionError(
                    f"k2u self-validation failed at global kmer {s + bad}: "
                    f"want (uid={uid_true[sl][bad]}, pos={upos_true[sl][bad]}, mt={want_mt}), "
                    f"got (uid={r['unitig_id'][bad]}, pos={r['pos'][bad]}, mt={r['mt'][bad]})"
                )


def merge_sharded_out(out: dict) -> dict:
    """Host-side merge of a merge=False sharded full-query result
    (parallel.sharding.build_fused_sharded_query) into flat per-lane k2u
    fields: phase-2 rows scattered over their (data-shard-local) lanes.
    Returns dict of [N] arrays unitig_id/unitig_len/pos/mt."""
    main = {kk: np.asarray(out["main"][kk]).copy()
            for kk in ("unitig_id", "unitig_len", "pos", "mt")}
    lanes = np.asarray(out["lanes"])
    sr = np.asarray(out["slot_real"])
    n_data = int(np.asarray(out["n_ovf"]).shape[0])
    M2 = lanes.shape[0] // n_data
    N = main["mt"].shape[0]
    per = N // n_data
    for d in range(n_data):
        sl = slice(d * M2, (d + 1) * M2)
        real = sr[sl]
        glo = lanes[sl][real] + d * per
        for kk in main:
            main[kk][glo] = np.asarray(out["phase2"][kk])[sl][real]
    return main


def validate_k2u_self_sharded(qf, k2u, batch: int):
    """validate_k2u_self driven THROUGH a sharded full-query fn (the
    multi-chip deployment path): every unitig k-mer, fw and rc, must
    resolve to its exact K2UPos after merging the compacted heavy phase.
    ``qf`` is a jitted kms[batch] -> merge=False dict
    (make_fused_sharded_query / make_fused_sharded_query_from_ckpt)."""
    import jax.numpy as jnp

    from ..kmer import revcomp

    us = k2u.unitigs
    k = us.k
    pos = us.kmer_start_positions()
    uid_true = us.pos_to_id(pos)
    upos_true = pos - us.accum[uid_true]
    ulen_true = us.unitig_len(uid_true)
    fw = us.get_kmer_u64(pos)

    for s in range(0, len(pos), batch):
        sl = slice(s, min(s + batch, len(pos)))
        n_real = sl.stop - sl.start
        for words, want_mt in ((fw[sl], MATCH_IDENTITY), (revcomp(fw[sl], k), MATCH_TWIN)):
            padded = np.zeros(batch, dtype=np.uint64)
            padded[:n_real] = words
            padded[n_real:] = words[0] if n_real else 0
            out = qf(jnp.asarray(padded))
            assert not bool(np.asarray(out["over_budget"]).any()), "phase-2 over budget"
            r = merge_sharded_out(out)
            ok = (
                (r["mt"][:n_real] == want_mt)
                & (r["unitig_id"][:n_real] == uid_true[sl])
                & (r["pos"][:n_real] == upos_true[sl])
                & (r["unitig_len"][:n_real] == ulen_true[sl])
            )
            if not ok.all():
                bad = int(np.flatnonzero(~ok)[0])
                raise AssertionError(
                    f"sharded k2u self-validation failed at global kmer {s + bad}: "
                    f"want (uid={uid_true[sl][bad]}, pos={upos_true[sl][bad]}, mt={want_mt}), "
                    f"got (uid={r['unitig_id'][bad]}, pos={r['pos'][bad]}, mt={r['mt'][bad]})"
                )
