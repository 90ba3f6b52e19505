"""Pallas mono2 probe kernel: the post-XLA route to 1e9 q/s/chip.

The XLA query path is gather-issue-bound at ~14 ns per random row
(docs/ROOFLINE.md): XLA lowers a random gather to a serial per-row loop
and never covers HBM latency. This kernel is the replacement primitive
for the bench-default mono2-occ32 engine (kphf/kcdict.py): one 56 B
bucket row per query, fetched with EXPLICIT async DMAs so many rows are
in flight at once, then ONE vectorized slot-compare/verify over the
whole block on the VPU.

Structure (per grid step = one block of ``BLK`` queries):

  h1 block   -> SMEM   (bucket index per lane, scalar-readable)
  table      -> stays in HBM; row ``h1[i]`` DMA'd to VMEM scratch row i
  clo/chi/.. -> VMEM   (canonical key halves + orientation, vector lanes)
  issue loop:  fori_loop starts one async copy per lane (the DMA queue
               pipelines them — this is the >=16-deep ring XLA refuses
               to emit)
  wait loop:   fori_loop waits each row's semaphore
  verify:      [BLK, SW*2] rows compared against the keys for both slots
               in pure VPU ops; hits select uid/upos/ulen/cnt/occ words

Status: the axon tunnel cannot compile ANY pallas_call (HTTP 500 from
the remote-compile helper — see docs/ROOFLINE.md §4, re-probed every
round), so this kernel ships interpret-mode-verified against the XLA
path (tests/test_pallas_query.py, marked slow) and is switched on with
``MAZU_PALLAS_QUERY=1`` (or ``use_pallas=True``) the day hardware
unblocks. Parity contract: bit-identical to
``kcdict_k2u(..., mode="main")`` for the mono2-occ32 scheme
(reference semantics: src/kphf/sshash.rs:471-554 hot loop, collapsed to
one bucket row by the mono design).
"""

from __future__ import annotations

import functools

import numpy as np

U32 = np.uint32
U64 = np.uint64

BLK = 512  # queries per grid step (SMEM index block = 2 KB)


def _kernel(sw: int, h_ref, clo_ref, chi_ref, isfw_ref, table_ref,
            uid_ref, pos_ref, ulen_ref, cnt_ref, mt_ref, ow_ref, ow2_ref,
            rows_ref, sems):
    """One block: DMA-ring fetch of BLK bucket rows + vector verify.

    sw: u32 words per slot (7 for the occ32 layout); bucket row = 2*sw.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def issue(i, _):
        # one async copy per lane; the DMA engine queues them all, so
        # row fetches overlap — the whole point of the kernel
        pltpu.make_async_copy(
            table_ref.at[h_ref[i]], rows_ref.at[i], sems.at[i]
        ).start()
        return _

    jax.lax.fori_loop(0, BLK, issue, None)

    def wait(i, _):
        pltpu.make_async_copy(
            table_ref.at[h_ref[i]], rows_ref.at[i], sems.at[i]
        ).wait()
        return _

    jax.lax.fori_loop(0, BLK, wait, None)

    rows = rows_ref[:]  # [BLK, 2*sw] u32
    clo = clo_ref[:]
    chi = chi_ref[:]
    is_fw_canon = isfw_ref[:] != 0

    found = jnp.zeros((BLK,), dtype=jnp.bool_)
    uid = jnp.zeros((BLK,), dtype=jnp.int32)
    upos = jnp.zeros((BLK,), dtype=jnp.int32)
    ulen = jnp.zeros((BLK,), dtype=jnp.int32)
    cnt = jnp.zeros((BLK,), dtype=jnp.int32)
    mt = jnp.zeros((BLK,), dtype=jnp.int32)
    ow = jnp.zeros((BLK,), dtype=jnp.uint32)
    ow2 = jnp.zeros((BLK,), dtype=jnp.uint32)

    for s in range(2):  # both slots of the bucket row, vectorized
        c = s * sw
        khi = rows[:, c + 1]
        hit = (
            (~found)
            & (rows[:, c + 0] == clo)
            & ((khi & U32(0x7FFFFFFF)) == chi)
        )
        canon_is_useq = (khi >> U32(31)) != 0
        mt_s = jnp.where(is_fw_canon == canon_is_useq, 1, 2).astype(jnp.int32)
        a = rows[:, c + 3]
        b = rows[:, c + 4]
        upos_s = (a & U32(0xFFFFFF)).astype(jnp.int32)
        ulen_s = ((a >> U32(24)).astype(jnp.int32)) | (
            (b & U32(0xFFFF)).astype(jnp.int32) << 8
        )
        cnt_s = (b >> U32(16)).astype(jnp.int32)
        uid = jnp.where(hit, rows[:, c + 2].astype(jnp.int32), uid)
        upos = jnp.where(hit, upos_s, upos)
        ulen = jnp.where(hit, ulen_s, ulen)
        cnt = jnp.where(hit, cnt_s, cnt)
        mt = jnp.where(hit, mt_s, mt)
        ow = jnp.where(hit, rows[:, c + 5], ow)
        ow2 = jnp.where(hit, rows[:, c + 6], ow2)
        found = found | hit

    uid_ref[:] = uid
    pos_ref[:] = upos
    ulen_ref[:] = ulen
    cnt_ref[:] = cnt
    mt_ref[:] = jnp.where(found, mt, 0)
    ow_ref[:] = ow
    ow2_ref[:] = ow2


@functools.partial(
    __import__("jax").jit, static_argnames=("sw", "interpret")
)
def _pallas_probe(table, h1, clo, chi, isfw, *, sw: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = h1.shape[0]
    assert n % BLK == 0
    grid = (n // BLK,)
    blk = lambda ms: pl.BlockSpec((BLK,), lambda i: (i,), memory_space=ms)  # noqa: E731
    out_i32 = jax.ShapeDtypeStruct((n,), jnp.int32)
    out_u32 = jax.ShapeDtypeStruct((n,), jnp.uint32)
    return pl.pallas_call(
        functools.partial(_kernel, sw),
        grid=grid,
        in_specs=[
            blk(pltpu.SMEM),  # h1
            blk(pltpu.VMEM),  # clo
            blk(pltpu.VMEM),  # chi
            blk(pltpu.VMEM),  # isfw
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=tuple(blk(pltpu.VMEM) for _ in range(7)),
        out_shape=(out_i32, out_i32, out_i32, out_i32, out_i32,
                   out_u32, out_u32),
        scratch_shapes=[
            pltpu.VMEM((BLK, 2 * sw), jnp.uint32),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
        interpret=interpret,
    )(h1, clo, chi, isfw, table)


def pallas_mono2_k2u(d: dict, fw_words, interpret: bool = False) -> dict:
    """Drop-in for ``kcdict_k2u(d, fw, jnp, mode="main")`` on a
    mono2-occ32 KCDict (the bench-default engine), with the bucket-row
    probe done by the Pallas DMA-ring kernel. Key prep (canonicalize,
    fold_hash32) and output widening stay in XLA — they are vector math,
    not gather-bound.

    ``interpret=True`` runs the TPU interpreter (works on CPU; the parity
    test lane). Compiled mode requires Mosaic, blocked on this tunnel.
    """
    import jax.numpy as jnp

    from ..kmer import revcomp
    from ..kphf.boophf32 import fold_hash32

    m = d["meta"]
    assert getattr(m, "scheme", "") == "mono2" and getattr(m, "occ32", False), (
        "pallas kernel targets the mono2-occ32 layout"
    )
    k = m.k
    sw = m.sw
    fw = jnp.asarray(fw_words)
    rc = revcomp(fw, k)
    canon = jnp.minimum(fw, rc)
    clo = (canon & U64(0xFFFFFFFF)).astype(jnp.uint32)
    chi = (canon >> U64(32)).astype(jnp.uint32)
    isfw = (fw == canon).astype(jnp.int32)
    h1 = (fold_hash32(canon) & U32(m.t - 1)).astype(jnp.int32)

    n = fw.shape[0]
    pad = (-n) % BLK
    if pad:
        z32 = lambda x, v: jnp.concatenate(  # noqa: E731
            [x, jnp.full((pad,), v, x.dtype)]
        )
        h1, clo, chi, isfw = (
            z32(h1, 0), z32(clo, 0), z32(chi, 0), z32(isfw, 0),
        )
    uid, pos, ulen, cnt, mt, ow, ow2 = _pallas_probe(
        d["table"], h1, clo, chi, isfw, sw=sw, interpret=interpret,
    )
    sl = slice(0, n)
    found = mt[sl] != 0
    out = {
        "unitig_id": uid[sl].astype(jnp.int64),
        "unitig_len": ulen[sl].astype(jnp.int64),
        "pos": pos[sl].astype(jnp.int64),
        "mt": mt[sl].astype(jnp.uint8),
        "occ_word": ow[sl].astype(jnp.uint64),
        "occ_word2": ow2[sl].astype(jnp.uint64),
        "occ_cnt": cnt[sl].astype(jnp.int64),
        "use_skew": jnp.zeros((n,), dtype=bool),
        "unresolved": ~found,
    }
    return out
