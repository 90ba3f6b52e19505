"""Pallas CAPACITY-tier probe kernel: packed positions + grouped16 bounds.

Companion to ops/pallas_query.py (the mono2 speed-tier kernel): this one
covers the multi-Gbp-per-chip layout the compact two-phase driver runs —
grouped16 bucket bounds, packed IntVector position windows, and the fused
3-word useq candidate verify (kphf/sshash.py probe_body_generic with
``defer_valid=True``). The XLA path pays ~5-9 random gathers per query at
~14-21 ns each because XLA lowers every random gather to a serial
issue-rate-bound loop (docs/ROOFLINE.md); this kernel fetches the same
bytes with EXPLICIT async DMAs so hundreds of rows are in flight at once.

Per grid step (one block of ``BLK`` queries), three DMA rings:

  A  bounds:    gdelta[h:h+2] (u16 pair) + gbase[h>>10], gbase[(h+1)>>10]
                -> SMEM (scalars feed the next ring's addressing)
  B  pos win:   packed-pos words [wi .. wi+nw) per lane, each word DMA'd
                with the SAME clipped index math as _pos_window -> SMEM
                (scalar extraction for ring C) + VMEM (vector verify)
  C  useq win:  per probe row j: words2[wj], words2[wj+1] (two 16 B rows
                covering the 3-word candidate window) -> VMEM
  verify:       both candidate k-mers extracted by shift/mask and compared
                against (fw, rc) in pure VPU ops — bit-identical to
                probe_body_generic's deferred-validation semantics

Post-loop work (us_validate_rank on the winner, uproj projection row,
unresolved bookkeeping) stays in XLA in ``pallas_capacity_k2u`` — same
split as the mono2 kernel, where key prep and output widening are vector
math, not gather-bound.

Hardware-lowering caveats (documented, not blocking: the axon tunnel
cannot compile ANY pallas_call — HTTP 500, re-probed every round, see
docs/ROOFLINE.md §4 — so this ships interpret-mode-verified like its
sibling): the verify uses u64 vectors, which a Mosaic build would split
into u32 lane pairs (as pallas_query.py already does for its key
compare); the scalar scratch lives in SMEM specifically so no vector
dynamic indexing is required anywhere.

Parity contract: bit-identical to
``sshash_k2u(d, fw, jnp, mode="main", probe_limit=plim,
defer_valid=True, mphf_level_limit=mlim)`` on grouped16+packed arrays
(reference hot loop: src/kphf/sshash.rs:471-554; projection
src/index.rs:193-216 via the uproj records). tests/test_pallas_capacity.py.
"""

from __future__ import annotations

import functools

import numpy as np

U64 = np.uint64

BLK = 256  # queries per grid step


def _kernel(plim, nw, width, k, w, last_km, n_posw, n_w2,
            hc_ref, fw_ref, rc_ref, off_ref,
            gdelta_ref, gbase_ref, posw_ref, words2_ref,
            pos_ref, mt_ref, nocc_ref,
            gd_s, gb_s, pw_s, ps_s, ne_s, wib_s, wjc_s,
            pw_v, uq_v, ps_v, ne_v,
            semA, semB, semC, semS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mask = U64((1 << width) - 1) if width < 64 else ~U64(0)
    kw_span = k - w  # candidate window base offset below mm_pos

    # ---- ring A: bucket bounds (grouped16: u16 in-group delta pair +
    # the one/two i64 group bases covering h and h+1)
    def a_copies(i):
        h = hc_ref[i]
        g0 = h >> 10
        g1 = (h + 1) >> 10
        return (
            pltpu.make_async_copy(
                gdelta_ref.at[pl.ds(h, 2)], gd_s.at[i], semA.at[i, 0]
            ),
            pltpu.make_async_copy(
                gbase_ref.at[pl.ds(g0, 1)], gb_s.at[i, pl.ds(0, 1)], semA.at[i, 1]
            ),
            pltpu.make_async_copy(
                gbase_ref.at[pl.ds(g1, 1)], gb_s.at[i, pl.ds(1, 1)], semA.at[i, 2]
            ),
        )

    def issue_a(i, _):
        for c in a_copies(i):
            c.start()
        return _

    jax.lax.fori_loop(0, BLK, issue_a, None)

    def wait_a(i, _):
        for c in a_copies(i):
            c.wait()
        return _

    jax.lax.fori_loop(0, BLK, wait_a, None)

    # ---- ring B: packed-pos window words (same clipped index math as
    # _pos_window: per-word clip keeps in-bounds entries exact at the
    # vector tail). SMEM copy feeds ring C's scalar extraction; the VMEM
    # mirror feeds the vector verify.
    def issue_b(i, _):
        ps = gb_s[i, 0].astype(jnp.int64) + gd_s[i, 0].astype(jnp.int64)
        pe = gb_s[i, 1].astype(jnp.int64) + gd_s[i, 1].astype(jnp.int64)
        ps_s[i] = ps
        ne_s[i] = pe - ps
        wi = (ps * width) >> 6
        wib_s[i] = wi
        for t in range(nw):
            wt = jnp.clip(wi + t, 0, n_posw - 1)
            pltpu.make_async_copy(
                posw_ref.at[pl.ds(wt, 1)], pw_s.at[i, pl.ds(t, 1)],
                semB.at[i, t, 0],
            ).start()
            pltpu.make_async_copy(
                posw_ref.at[pl.ds(wt, 1)], pw_v.at[i, pl.ds(t, 1)],
                semB.at[i, t, 1],
            ).start()
        return _

    jax.lax.fori_loop(0, BLK, issue_b, None)
    # block-copy the scalar bounds into VMEM vectors for the verify
    cps = pltpu.make_async_copy(ps_s, ps_v, semS.at[0])
    cne = pltpu.make_async_copy(ne_s, ne_v, semS.at[1])
    cps.start()
    cne.start()

    def wait_b(i, _):
        wi = wib_s[i]
        for t in range(nw):
            wt = jnp.clip(wi + t, 0, n_posw - 1)
            pltpu.make_async_copy(
                posw_ref.at[pl.ds(wt, 1)], pw_s.at[i, pl.ds(t, 1)],
                semB.at[i, t, 0],
            ).wait()
            pltpu.make_async_copy(
                posw_ref.at[pl.ds(wt, 1)], pw_v.at[i, pl.ds(t, 1)],
                semB.at[i, t, 1],
            ).wait()
        return _

    jax.lax.fori_loop(0, BLK, wait_b, None)

    # ---- ring C: per probe row, the paired-words candidate window
    # (words2[wj], words2[wj+1] -> q0,q1,q2 — probe_body_generic's fused
    # 3-word read). Scalar extraction of mm_pos[j] from the SMEM window.
    def issue_c(i, _):
        ps = ps_s[i]
        woff = (ps * width) & 63
        for j in range(plim):
            dbit = woff + j * width
            sel = dbit >> 6
            r = (dbit & 63).astype(jnp.uint64)
            lo = pw_s[i, 0]
            hi = pw_s[i, min(1, nw - 1)]
            for t in range(1, nw):
                lo = jnp.where(sel == t, pw_s[i, t], lo)
                hi = jnp.where(sel == t, pw_s[i, min(t + 1, nw - 1)], hi)
            hi_bits = jnp.where(
                r == 0,
                jnp.uint64(0),
                hi << ((jnp.uint64(64) - r) & jnp.uint64(63)),
            )
            mm = ((lo >> r) | hi_bits) & mask
            base = jnp.maximum(mm.astype(jnp.int64) - kw_span, 0)
            wj = (base * 2) >> 6
            wjc = jnp.clip(wj, 0, n_w2 - 1).astype(jnp.int32)
            wjc_s[i, j] = wjc
            pltpu.make_async_copy(
                words2_ref.at[pl.ds(wjc, 1)], uq_v.at[i, j, pl.ds(0, 1)],
                semC.at[i, j, 0],
            ).start()
            wjc1 = jnp.minimum(wjc + 1, n_w2 - 1)
            pltpu.make_async_copy(
                words2_ref.at[pl.ds(wjc1, 1)], uq_v.at[i, j, pl.ds(1, 1)],
                semC.at[i, j, 1],
            ).start()
        return _

    jax.lax.fori_loop(0, BLK, issue_c, None)

    def wait_c(i, _):
        for j in range(plim):
            wjc = wjc_s[i, j]
            pltpu.make_async_copy(
                words2_ref.at[pl.ds(wjc, 1)], uq_v.at[i, j, pl.ds(0, 1)],
                semC.at[i, j, 0],
            ).wait()
            wjc1 = jnp.minimum(wjc + 1, n_w2 - 1)
            pltpu.make_async_copy(
                words2_ref.at[pl.ds(wjc1, 1)], uq_v.at[i, j, pl.ds(1, 1)],
                semC.at[i, j, 1],
            ).wait()
        return _

    jax.lax.fori_loop(0, BLK, wait_c, None)
    cps.wait()
    cne.wait()

    # ---- vector verify: probe_body_generic with defer_valid=True
    fw = fw_ref[:]
    rc = rc_ref[:]
    offset = off_ref[:].astype(jnp.int64)
    rc_offset = (k - w) - offset
    ps = ps_v[:]
    n_occs = ne_v[:]
    pw = pw_v[:]  # [BLK, nw] u64
    uq = uq_v[:]  # [BLK, plim, 2, 2] u64
    woff = (ps * width & 63).astype(jnp.uint64)
    m2k = U64((1 << (2 * k)) - 1)

    found = jnp.zeros((BLK,), dtype=jnp.bool_)
    out_pos = jnp.zeros((BLK,), dtype=jnp.int64)
    out_mt = jnp.zeros((BLK,), dtype=jnp.int32)
    for j in range(plim):
        active = (~found) & (j < n_occs)
        dbit = woff + U64(j * width)
        sel = dbit >> U64(6)
        r = (dbit & U64(63)).astype(jnp.uint64)
        lo = pw[:, 0]
        hi = pw[:, min(1, nw - 1)]
        for t in range(1, nw):
            tt = U64(t)
            lo = jnp.where(sel == tt, pw[:, t], lo)
            hi = jnp.where(sel == tt, pw[:, min(t + 1, nw - 1)], hi)
        hi_shift = (U64(64) - r) & U64(63)
        hi_bits = jnp.where(r == 0, jnp.zeros_like(hi), hi << hi_shift)
        mm_pos = (((lo >> r) | hi_bits) & mask).astype(jnp.int64)

        base = jnp.maximum(mm_pos - kw_span, 0)
        woff2 = ((base * 2) & 63).astype(jnp.uint64)
        q0, q1, q2 = uq[:, j, 0, 0], uq[:, j, 0, 1], uq[:, j, 1, 1]
        for cand_off in (offset, rc_offset):
            km_pos = mm_pos - cand_off
            in_range = (mm_pos >= cand_off) & (km_pos <= last_km)
            km_pos_c = jnp.clip(km_pos, 0, max(last_km, 0))
            dbit2 = woff2 + (2 * jnp.clip(km_pos_c - base, 0, None)).astype(
                jnp.uint64
            )
            s1 = dbit2 >= 64
            r2 = (dbit2 & U64(63)).astype(jnp.uint64)
            lo_w = jnp.where(s1, q1, q0)
            hi_w = jnp.where(s1, q2, q1)
            hs = (U64(64) - r2) & U64(63)
            hb = jnp.where(r2 == 0, jnp.zeros_like(hi_w), hi_w << hs)
            kw = ((lo_w >> r2) | hb) & m2k
            mt = jnp.where(kw == fw, 1, jnp.where(kw == rc, 2, 0)).astype(
                jnp.int32
            )
            hit = active & in_range & (mt > 0)
            out_pos = jnp.where(hit, km_pos_c, out_pos)
            out_mt = jnp.where(hit, mt, out_mt)
            found = found | hit
            active = active & (~hit)

    pos_ref[:] = out_pos.astype(jnp.uint32)
    mt_ref[:] = out_mt
    nocc_ref[:] = n_occs.astype(jnp.int32)


def _kernel_bpos(plim, k, w, last_km, skew_param, n_rec,
                 hc_ref, fw_ref, rc_ref, off_ref,
                 bpos_ref, rec_ref,
                 pos_ref, mt_ref, uid_ref, ulen_ref, cnt_ref, nocc_ref,
                 ow_ref, ow2_ref,
                 bp_s, bp_v, uq_v, wjc_s,
                 semA, semC, semS):
    """Round-5 kernel for the COMMITTED capacity config (STATUS r4:
    bpos bucket-inline rows + useqrec window records, 8.1M q/s at
    300Mbp): ring A DMAs the ONE bpos row (bounds + first-3 candidate
    positions + count, 16 B); ring C DMAs ONE 56 B useqrec row per probe
    iteration — the whole probe is 1+plim DMAs with validation, rank,
    and projection riding the record row (probe_body_usrec semantics,
    incl. the mt==3 boundary sentinel)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kw_span = k - w

    # ---- ring A: one bpos row per lane -> SMEM (ring-C addressing) +
    # VMEM mirror (vector verify reads counts/positions)
    def a_copies(i):
        h = hc_ref[i]
        return (
            pltpu.make_async_copy(
                bpos_ref.at[pl.ds(h, 1)], bp_s.at[pl.ds(i, 1)], semA.at[i, 0]
            ),
            pltpu.make_async_copy(
                bpos_ref.at[pl.ds(h, 1)], bp_v.at[pl.ds(i, 1)], semA.at[i, 1]
            ),
        )

    def issue_a(i, _):
        for c in a_copies(i):
            c.start()
        return _

    jax.lax.fori_loop(0, BLK, issue_a, None)

    def wait_a(i, _):
        for c in a_copies(i):
            c.wait()
        return _

    jax.lax.fori_loop(0, BLK, wait_a, None)

    # ---- ring C: one useqrec row per probe iteration
    def issue_c(i, _):
        for j in range(plim):
            mm = bp_s[i, j].astype(jnp.int64)
            base = jnp.maximum(mm - kw_span, 0)
            wj = jnp.clip((base * 2) >> 6, 0, n_rec - 1).astype(jnp.int32)
            wjc_s[i, j] = wj
            pltpu.make_async_copy(
                rec_ref.at[pl.ds(wj, 1)], uq_v.at[i, pl.ds(j, 1)],
                semC.at[i, j],
            ).start()
        return _

    jax.lax.fori_loop(0, BLK, issue_c, None)

    def wait_c(i, _):
        for j in range(plim):
            wj = wjc_s[i, j]
            pltpu.make_async_copy(
                rec_ref.at[pl.ds(wj, 1)], uq_v.at[i, pl.ds(j, 1)],
                semC.at[i, j],
            ).wait()
        return _

    jax.lax.fori_loop(0, BLK, wait_c, None)

    # ---- vector verify: probe_body_usrec bit-for-bit
    fw = fw_ref[:]
    rc = rc_ref[:]
    offset = off_ref[:].astype(jnp.int64)
    rc_offset = (k - w) - offset
    n_occs = bp_v[:, 3].astype(jnp.int64)
    use_skew = (
        (n_occs > skew_param)
        if skew_param >= 0
        else jnp.zeros_like(n_occs, dtype=jnp.bool_)
    )
    m2k = U64((1 << (2 * k)) - 1)

    found = jnp.zeros((BLK,), dtype=jnp.bool_)
    out_pos = jnp.zeros((BLK,), dtype=jnp.int64)
    out_mt = jnp.zeros((BLK,), dtype=jnp.int32)
    out_uid = jnp.zeros((BLK,), dtype=jnp.int64)
    out_ulen = jnp.zeros((BLK,), dtype=jnp.int64)
    out_cnt = jnp.zeros((BLK,), dtype=jnp.int64)
    out_ow = jnp.zeros((BLK,), dtype=jnp.uint64)
    out_ow2 = jnp.zeros((BLK,), dtype=jnp.uint64)
    for j in range(plim):
        active = (~found) & (j < n_occs) & (~use_skew)
        mm_pos = bp_v[:, j].astype(jnp.int64)
        base = jnp.maximum(mm_pos - kw_span, 0)
        wi = (base * 2) >> 6
        r0 = uq_v[:, j]  # [BLK, 7] u64
        q0, q1, q2 = r0[:, 0], r0[:, 1], r0[:, 2]
        f2 = r0[:, 3]
        ustart = (f2 & U64((1 << 40) - 1)).astype(jnp.int64)
        ulen = (f2 >> U64(40)).astype(jnp.int64)
        f3 = r0[:, 4]
        uid = (f3 & U64(0xFFFFFFFF)).astype(jnp.int64)
        cnt = (f3 >> U64(32)).astype(jnp.int64)
        woff = ((base * 2) & 63).astype(jnp.uint64)
        for cand_off in (offset, rc_offset):
            km_pos = mm_pos - cand_off
            in_range = (mm_pos >= cand_off) & (km_pos <= last_km)
            km_pos_c = jnp.clip(km_pos, 0, max(last_km, 0))
            dbit = woff + (2 * jnp.clip(km_pos_c - base, 0, None)).astype(
                jnp.uint64
            )
            s1 = dbit >= 64
            r = (dbit & U64(63)).astype(jnp.uint64)
            lo_w = jnp.where(s1, q1, q0)
            hi_w = jnp.where(s1, q2, q1)
            hs = (U64(64) - r) & U64(63)
            hb = jnp.where(r == 0, jnp.zeros_like(hi_w), hi_w << hs)
            kw = ((lo_w >> r) | hb) & m2k
            mt = jnp.where(kw == fw, 1, jnp.where(kw == rc, 2, 0)).astype(
                jnp.int32
            )
            ok = (km_pos_c >= ustart) & (km_pos_c + k <= ustart + ulen)
            kwm = active & in_range & (mt > 0)
            hit = kwm & ok
            out_uid = jnp.where(hit, uid, out_uid)
            out_ulen = jnp.where(hit, ulen, out_ulen)
            out_pos = jnp.where(hit, km_pos_c - ustart, out_pos)
            out_mt = jnp.where(
                hit, mt, jnp.where(kwm & (~ok), jnp.int32(3), out_mt)
            )
            out_ow = jnp.where(hit, r0[:, 5], out_ow)
            out_ow2 = jnp.where(hit, r0[:, 6], out_ow2)
            out_cnt = jnp.where(hit, cnt, out_cnt)
            found = found | hit
            active = active & (~hit)

    pos_ref[:] = out_pos.astype(jnp.int32)
    mt_ref[:] = out_mt
    uid_ref[:] = out_uid.astype(jnp.int32)
    ulen_ref[:] = out_ulen.astype(jnp.int32)
    cnt_ref[:] = out_cnt.astype(jnp.int32)
    nocc_ref[:] = n_occs.astype(jnp.int32)
    ow_ref[:] = out_ow
    ow2_ref[:] = out_ow2


@functools.partial(
    __import__("jax").jit,
    static_argnames=("plim", "k", "w", "last_km", "skew_param", "interpret"),
)
def _pallas_bpos_probe(
    bpos, rec, hc, fw, rc, offset,
    *, plim, k, w, last_km, skew_param, interpret,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = hc.shape[0]
    assert n % BLK == 0
    grid = (n // BLK,)
    blk = lambda ms: pl.BlockSpec((BLK,), lambda i: (i,), memory_space=ms)  # noqa: E731
    o32 = jax.ShapeDtypeStruct((n,), jnp.int32)
    return pl.pallas_call(
        functools.partial(
            _kernel_bpos, plim, k, w, last_km, skew_param, rec.shape[0]
        ),
        grid=grid,
        in_specs=[
            blk(pltpu.SMEM),  # hc
            blk(pltpu.VMEM),  # fw
            blk(pltpu.VMEM),  # rc
            blk(pltpu.VMEM),  # offset
            pl.BlockSpec(memory_space=pl.ANY),  # bpos (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # useqrec (HBM)
        ],
        out_specs=tuple(blk(pltpu.VMEM) for _ in range(8)),
        out_shape=(
            o32, o32, o32, o32, o32, o32,
            jax.ShapeDtypeStruct((n,), jnp.uint64),
            jax.ShapeDtypeStruct((n,), jnp.uint64),
        ),
        scratch_shapes=[
            pltpu.SMEM((BLK, 4), jnp.uint32),   # bp_s
            pltpu.VMEM((BLK, 4), jnp.uint32),   # bp_v
            pltpu.VMEM((BLK, plim, 7), jnp.uint64),  # uq_v
            pltpu.SMEM((BLK, plim), jnp.int32),  # wjc_s
            pltpu.SemaphoreType.DMA((BLK, 2)),        # semA
            pltpu.SemaphoreType.DMA((BLK, plim)),     # semC
            pltpu.SemaphoreType.DMA((1,)),            # semS (unused spare)
        ],
        interpret=interpret,
    )(hc, fw, rc, offset, bpos, rec)


def pallas_bpos_usrec_k2u(d: dict, fw_words, probe_limit: int, interpret: bool = False) -> dict:
    """Drop-in for ``sshash_k2u(d, fw, jnp, mode="main",
    probe_limit=probe_limit)`` on the COMMITTED capacity layout
    (direct engine + bucket_inline bpos + useqrec records — the 8.1M
    config, STATUS r4): 1+plim DMAs per query, validation + rank +
    projection riding the record rows. Key prep and unresolved
    bookkeeping stay in XLA, exactly as in the XLA path.

    ``interpret=True`` runs the TPU interpreter (the parity-test lane);
    compiled mode requires Mosaic, blocked on this tunnel
    (docs/ROOFLINE.md §4)."""
    import jax.numpy as jnp

    from ..kmer import canonical_minimizer_batch, revcomp
    from ..kphf.boophf32 import fold_hash32

    m = d["meta"]
    k, w = m.k, m.w
    assert m.direct_t and "bpos" in d, "bpos kernel needs the bucket-inline direct layout"
    us = d["us"]
    assert "useqrec" in us, "bpos kernel needs the useqrec window records"
    bound = min(m.probe_bound, int(probe_limit), d["bpos"].shape[1] - 1)
    fw = jnp.asarray(fw_words)
    rc = revcomp(fw, k)
    mm, offset, _isfw, _canon = canonical_minimizer_batch(
        jnp, fw, k, w, m.seed, ordering=getattr(m, "ordering", None),
        hash32=m.hash32,
    )
    offset = offset.astype(jnp.int32)
    hc = (fold_hash32(mm) & np.uint32(m.direct_t - 1)).astype(jnp.int32)
    last_km = int(us["meta"].total_len - k)

    n = fw.shape[0]
    pad = (-n) % BLK
    if pad:
        z = lambda x: jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])  # noqa: E731
        hc_p, fw_p, rc_p, off_p = z(hc), z(fw), z(rc), z(offset)
    else:
        hc_p, fw_p, rc_p, off_p = hc, fw, rc, offset

    pos_o, mt_o, uid_o, ulen_o, cnt_o, nocc_o, ow_o, ow2_o = _pallas_bpos_probe(
        d["bpos"], us["useqrec"], hc_p, fw_p, rc_p, off_p,
        plim=bound, k=k, w=w, last_km=last_km,
        skew_param=int(m.skew_param), interpret=interpret,
    )
    sl = slice(0, n)
    n_occs = nocc_o[sl].astype(jnp.int64)
    use_skew = (
        (n_occs > m.skew_param)
        if m.skew_param >= 0
        else jnp.zeros_like(n_occs, dtype=bool)
    )
    out_mt = mt_o[sl].astype(jnp.uint8)
    maybe = out_mt == jnp.uint8(3)
    out_mt = jnp.where(maybe, jnp.zeros_like(out_mt), out_mt)
    found = out_mt > 0
    zero = jnp.zeros(n, dtype=jnp.int64)
    return {
        "unitig_id": jnp.where(found, uid_o[sl].astype(jnp.int64), zero),
        "unitig_len": jnp.where(found, ulen_o[sl].astype(jnp.int64), zero),
        "pos": pos_o[sl].astype(jnp.int64),
        "mt": out_mt,
        "use_skew": use_skew,
        "unresolved": ((~found) & (~use_skew) & (n_occs > bound)) | maybe,
        "occ_word": ow_o[sl],
        "occ_word2": ow2_o[sl],
        "occ_cnt": jnp.where(found, cnt_o[sl].astype(jnp.int64), zero),
    }


@functools.partial(
    __import__("jax").jit,
    static_argnames=("plim", "nw", "width", "k", "w", "last_km", "interpret"),
)
def _pallas_capacity_probe(
    gdelta, gbase, posw, words2, hc, fw, rc, offset,
    *, plim, nw, width, k, w, last_km, interpret,
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = hc.shape[0]
    assert n % BLK == 0
    grid = (n // BLK,)
    blk = lambda ms: pl.BlockSpec((BLK,), lambda i: (i,), memory_space=ms)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _kernel, plim, nw, width, k, w, last_km,
            posw.shape[0], words2.shape[0],
        ),
        grid=grid,
        in_specs=[
            blk(pltpu.SMEM),  # hc
            blk(pltpu.VMEM),  # fw
            blk(pltpu.VMEM),  # rc
            blk(pltpu.VMEM),  # offset
            pl.BlockSpec(memory_space=pl.ANY),  # gdelta (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # gbase
            pl.BlockSpec(memory_space=pl.ANY),  # posw
            pl.BlockSpec(memory_space=pl.ANY),  # words2
        ],
        out_specs=(blk(pltpu.VMEM), blk(pltpu.VMEM), blk(pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.uint32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((BLK, 2), jnp.uint16),   # gd_s
            pltpu.SMEM((BLK, 2), jnp.int64),    # gb_s
            pltpu.SMEM((BLK, nw), jnp.uint64),  # pw_s
            pltpu.SMEM((BLK,), jnp.int64),      # ps_s
            pltpu.SMEM((BLK,), jnp.int64),      # ne_s
            pltpu.SMEM((BLK,), jnp.int64),      # wib_s
            pltpu.SMEM((BLK, plim), jnp.int32),  # wjc_s
            pltpu.VMEM((BLK, nw), jnp.uint64),  # pw_v
            pltpu.VMEM((BLK, plim, 2, 2), jnp.uint64),  # uq_v
            pltpu.VMEM((BLK,), jnp.int64),      # ps_v
            pltpu.VMEM((BLK,), jnp.int64),      # ne_v
            pltpu.SemaphoreType.DMA((BLK, 3)),        # semA
            pltpu.SemaphoreType.DMA((BLK, nw, 2)),    # semB
            pltpu.SemaphoreType.DMA((BLK, plim, 2)),  # semC
            pltpu.SemaphoreType.DMA((2,)),            # semS
        ],
        interpret=interpret,
    )(hc, fw, rc, offset, gdelta, gbase, posw, words2)


def pallas_capacity_k2u(
    d: dict,
    fw_words,
    probe_limit: int,
    interpret: bool = False,
    mphf_level_limit: int | None = None,
) -> dict:
    """Drop-in for ``sshash_k2u(d, fw, jnp, mode="main",
    probe_limit=probe_limit, defer_valid=True,
    mphf_level_limit=mphf_level_limit)`` on the capacity-tier layout
    (prefix_kind="grouped16", pos_kind="packed", paired words2/wb2), with
    the bounds + pos-window + candidate-verify probe done by the Pallas
    DMA-ring kernel. Key prep (minimizer scan, bucket hash / MPHF chain)
    and the post-loop tail (deferred validate+rank, uproj projection,
    unresolved bookkeeping) stay in XLA — vector math and per-LANE
    gathers, exactly as in the XLA path.

    ``interpret=True`` runs the TPU interpreter (works on CPU; the parity
    test lane). Compiled mode requires Mosaic, blocked on this tunnel.
    """
    import jax.numpy as jnp

    from ..containers.unitig_set import us_extent, us_rank, us_validate_rank
    from ..kmer import canonical_minimizer_batch, revcomp
    from ..kphf.boophf32 import fold_hash32
    from ..kphf.sshash import mphf_lookup

    m = d["meta"]
    k, w = m.k, m.w
    assert m.prefix_kind == "grouped16" and m.pos_kind == "packed", (
        "pallas capacity kernel targets the grouped16+packed layout"
    )
    us = d["us"]
    assert "words2" in us["useq"] and "wb2" in us["bv"], (
        "pallas capacity kernel needs the paired device layouts"
    )
    fw = jnp.asarray(fw_words)
    rc = revcomp(fw, k)
    mm, offset, _isfw, _canon = canonical_minimizer_batch(
        jnp, fw, k, w, m.seed, ordering=getattr(m, "ordering", None),
        hash32=m.hash32,
    )
    offset = offset.astype(jnp.int32)

    mphf_unres = None
    if m.direct_t:
        hc = (fold_hash32(mm) & np.uint32(m.direct_t - 1)).astype(jnp.int32)
        dead = jnp.zeros(fw.shape, dtype=bool)
    else:
        if mphf_level_limit is not None:
            h, mphf_unres = mphf_lookup(
                d["mphf"], mm, jnp, level_limit=mphf_level_limit
            )
        else:
            h = mphf_lookup(d["mphf"], mm, jnp)
        h = h.astype(jnp.int64)
        dead = h < 0
        hc = jnp.clip(h, 0, None).astype(jnp.int32)

    iv = d["pos"]
    width = int(iv["meta"].width)
    bound = min(m.probe_bound, probe_limit)
    nw = (63 + bound * width - 1) // 64 + 1
    last_km = int(us["meta"].total_len - k)

    n = fw.shape[0]
    pad = (-n) % BLK
    if pad:
        z = lambda x: jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])  # noqa: E731
        hc_p, fw_p, rc_p, off_p = z(hc), z(fw), z(rc), z(offset)
    else:
        hc_p, fw_p, rc_p, off_p = hc, fw, rc, offset

    pos_o, mt_o, nocc_o = _pallas_capacity_probe(
        d["prefix"]["gdelta"], d["prefix"]["gbase"], iv["words"],
        us["useq"]["words2"], hc_p, fw_p, rc_p, off_p,
        plim=bound, nw=nw, width=width, k=k, w=w, last_km=last_km,
        interpret=interpret,
    )
    sl = slice(0, n)
    n_occs = jnp.where(dead, 0, nocc_o[sl].astype(jnp.int64))
    out_pos = pos_o[sl].astype(jnp.int64)
    out_mt = mt_o[sl].astype(jnp.uint8)
    use_skew = (
        (n_occs > m.skew_param)
        if m.skew_param >= 0
        else jnp.zeros_like(n_occs, dtype=bool)
    )
    # lanes whose bucket is skew-deep never probe in the XLA path (masked
    # before the loop); the kernel probes them — their first rows are
    # identical — so drop any hit AND its stored position here for
    # bit-parity (same for dead MPHF lanes, whose bucket is garbage)
    found = (out_mt > 0) & (~use_skew) & (~dead)
    out_mt = jnp.where(found, out_mt, jnp.zeros_like(out_mt))
    out_pos = jnp.where(found, out_pos, jnp.zeros_like(out_pos))

    # ---- deferred validation + rank (one wb2 pair window), as sshash_k2u
    posw = jnp.where(found, out_pos, jnp.zeros_like(out_pos))
    vok, uid_r = us_validate_rank(us, posw, jnp)
    deferred_fail = found & (~vok)
    found = found & vok
    out_mt = jnp.where(found, out_mt, jnp.zeros_like(out_mt))

    zero = jnp.zeros_like(out_pos)
    uproj = us.get("uproj")
    out = {}
    if uproj is not None:
        uid = jnp.clip(uid_r, 0, uproj.shape[0] - 1)
        row = uproj[uid]
        ustart = row[..., 0].astype(jnp.int64)
        out["unitig_id"] = jnp.where(found, uid, zero)
        out["unitig_len"] = jnp.where(found, row[..., 1].astype(jnp.int64), zero)
        out["pos"] = jnp.where(found, out_pos - ustart, out_pos)
        uoc = row[..., 2]
        zw = jnp.zeros_like(row[..., 3])
        out["occ_word"] = jnp.where(found, row[..., 3], zw)
        out["occ_word2"] = jnp.where(found, row[..., 4], zw)
        oc = jnp.where(found, (uoc & U64(0xFFFFFFFF)).astype(jnp.int64), zero)
        out["occ_cnt"] = oc & 0xFFFFFFFF
        out["occ_start"] = jnp.where(
            found, (uoc >> U64(32)).astype(jnp.int64), zero
        )
    else:
        uid = jnp.clip(uid_r, 0, max(us["meta"].n_unitigs - 1, 0))
        start, end = us_extent(us, uid, jnp)
        out["unitig_id"] = jnp.where(found, uid, zero)
        out["unitig_len"] = jnp.where(found, end - start, zero)
        out["pos"] = jnp.where(found, posw - start, out_pos)
    out["mt"] = out_mt
    out["use_skew"] = use_skew
    out["unresolved"] = (
        ((~found) & (~use_skew) & (n_occs > bound))
        | deferred_fail
        | (mphf_unres if mphf_unres is not None else jnp.zeros_like(found))
    )
    return out
