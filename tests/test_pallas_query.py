"""Pallas mono2 DMA-ring probe kernel: interpret-mode parity vs the XLA
path (kcdict_k2u mode="main") on a real mono2-occ32 dictionary.

The kernel cannot compile on this environment (the axon tunnel's remote
compiler 500s on every pallas_call — docs/ROOFLINE.md §4); interpret
mode exercises the full DMA/semaphore/verify structure through the TPU
interpreter so the kernel is proven correct for the day hardware
unblocks."""

import numpy as np
import pytest

from mazu_tpu.containers.unitig_set import UnitigSet
from mazu_tpu.index.spt import SPT
from mazu_tpu.kmer import revcomp
from mazu_tpu.kphf.kcdict import KCDict, kcdict_k2u


@pytest.fixture(scope="module")
def mono2_dict():
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), 120)) for _ in range(24)]
    k = 21
    us = UnitigSet.from_seqs(seqs, k)
    n = us.n_unitigs
    spt = SPT(
        us,
        [f"r{i}" for i in range(n)],
        np.arange(n, dtype=np.int64),
        np.arange(n, dtype=np.int64),
        np.zeros(n, dtype=np.int64),
        np.ones(n, dtype=np.int64),
        us.unitig_len(np.arange(n)),
    )
    kc = KCDict.from_unitig_set(
        us, occ_table=spt.piscem_table(), scheme="mono2", load=0.25
    )
    assert kc.occ32, "fixture must hit the occ32 single-gather layout"
    return kc


def test_pallas_mono2_matches_xla(mono2_dict):
    import jax.numpy as jnp

    from mazu_tpu.ops.pallas_query import pallas_mono2_k2u

    kc = mono2_dict
    us = kc.unitigs
    k = kc.k
    rng = np.random.default_rng(11)
    kms = us.get_kmer_u64(us.kmer_start_positions())
    B = 600  # deliberately not a BLK multiple: exercises the pad path
    work = np.tile(kms, -(-B // len(kms)))[:B]
    flip = rng.random(B) < 0.5
    work[flip] = revcomp(work[flip], k)
    miss = rng.random(B) < 0.1
    work[miss] = rng.integers(0, 1 << 62, int(miss.sum()), dtype=np.uint64)

    d = kc.device_arrays()
    want = kcdict_k2u(d, work, jnp, mode="main")
    got = pallas_mono2_k2u(d, jnp.asarray(work), interpret=True)
    for key in ("unitig_id", "unitig_len", "pos", "mt", "occ_word",
                "occ_word2", "occ_cnt", "use_skew", "unresolved"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(want[key]), err_msg=key
        )
    # displaced keys (side table) must surface as unresolved, not wrong
    unres = np.asarray(got["unresolved"])
    full = kcdict_k2u(d, work, jnp, mode="full")
    assert (np.asarray(full["mt"])[~miss] > 0).all()
    assert (np.asarray(got["mt"])[unres] == 0).all()


def test_pallas_switch_full_query(mono2_dict, monkeypatch):
    """MAZU_PALLAS_QUERY=interpret swaps the main-phase probe inside
    get_ref_pos_compact; the full two-phase result must stay identical."""
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import ModIndex, get_ref_pos_compact

    kc = mono2_dict
    # rebuild the occ table the fixture's slots were fused from
    us = kc.unitigs
    n = us.n_unitigs
    spt = SPT(
        us,
        [f"r{i}" for i in range(n)],
        np.arange(n, dtype=np.int64),
        np.arange(n, dtype=np.int64),
        np.zeros(n, dtype=np.int64),
        np.ones(n, dtype=np.int64),
        us.unitig_len(np.arange(n)),
    )
    from mazu_tpu.containers.refseq import RefSeqCollection

    refs = RefSeqCollection(
        None,
        np.concatenate([[0], np.cumsum(spt.ref_lens)]).astype(np.int64),
        [f"r{i}" for i in range(n)],
    )
    idx = ModIndex(kc, spt.piscem_table(), refs, index_type="t")
    arrays = jax.device_put(idx.device_arrays())
    kms = jnp.asarray(us.get_kmer_u64(us.kmer_start_positions())[:512])
    mo = max(1, idx.max_occs())
    want = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, merge=False, m2=256)
    )
    monkeypatch.setenv("MAZU_PALLAS_QUERY", "interpret")
    got = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, merge=False, m2=256)
    )
    for key in ("unitig_id", "pos", "mt"):
        np.testing.assert_array_equal(got["main"][key], want["main"][key], key)
    np.testing.assert_array_equal(got["n_ovf"], want["n_ovf"])
