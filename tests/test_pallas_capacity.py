"""Pallas capacity-tier DMA-ring kernel: interpret-mode parity vs the XLA
path (sshash_k2u mode="main", defer_valid) on the grouped16+packed layout.

Same contract as tests/test_pallas_query.py for the mono2 speed tier: the
axon tunnel cannot compile any pallas_call (docs/ROOFLINE.md §4), so the
kernel ships interpret-verified — the full DMA/semaphore/verify structure
runs through the TPU interpreter — ready for the day Mosaic compiles.
"""

import numpy as np
import pytest

from mazu_tpu.kmer import revcomp

KEYS_UPROJ = (
    "unitig_id", "unitig_len", "pos", "mt", "use_skew", "unresolved",
    "occ_word", "occ_word2", "occ_cnt", "occ_start",
)


@pytest.fixture(scope="module")
def cap_index():
    import __graft_entry__ as g

    # the toy index plants a heavy (skew) bucket, a mid-depth (unresolved
    # at shallow plims) bucket, and >2-occ unitigs — all the branches the
    # capacity tier routes through phase 2
    return g._toy_index(n_seqs=24, seq_len=220)


def _work(idx, B=600, seed=3):
    us = idx.k2u.unitigs
    rng = np.random.default_rng(seed)
    kms = us.get_kmer_u64(us.kmer_start_positions())
    work = np.tile(kms, -(-B // len(kms)))[:B]
    flip = rng.random(B) < 0.5
    work[flip] = revcomp(work[flip], idx.k)
    miss = rng.random(B) < 0.1
    work[miss] = rng.integers(0, 1 << 61, int(miss.sum()), dtype=np.uint64)
    return work


def _arrays(idx, uproj=True):
    from mazu_tpu.index.modindex import build_uproj

    d = idx.k2u.device_arrays(prefix_kind="grouped16", pos_kind="packed")
    if uproj:
        d["us"]["uproj"] = build_uproj(idx.u2pos, idx.k2u.unitigs)
    return d


@pytest.mark.parametrize("plim", [2, 3])
def test_pallas_capacity_matches_xla_direct(cap_index, plim):
    import jax.numpy as jnp

    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.ops.pallas_capacity import pallas_capacity_k2u

    idx = cap_index
    d = _arrays(idx)
    work = _work(idx)
    want = sshash_k2u(
        d, work, jnp, mode="main", probe_limit=plim, defer_valid=True
    )
    got = pallas_capacity_k2u(d, jnp.asarray(work), plim, interpret=True)
    for key in KEYS_UPROJ:
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(want[key]), err_msg=key
        )
    # the toy index must actually exercise the hard branches
    assert np.asarray(got["use_skew"]).any(), "no skew lanes probed"
    if plim == 2:  # the planted mid-depth bucket outruns a 2-deep probe
        assert np.asarray(got["unresolved"]).any(), "no unresolved lanes"
    assert (np.asarray(got["mt"]) > 0).any(), "no main-phase hits"


def test_pallas_capacity_no_uproj_map_path(cap_index):
    """Without uproj records the wrapper takes the validate+rank+extent
    mapping path — must still match the XLA main phase bit-for-bit."""
    import jax.numpy as jnp

    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.ops.pallas_capacity import pallas_capacity_k2u

    idx = cap_index
    d = _arrays(idx, uproj=False)
    work = _work(idx, seed=5)
    want = sshash_k2u(
        d, work, jnp, mode="main", probe_limit=3, defer_valid=True
    )
    got = pallas_capacity_k2u(d, jnp.asarray(work), 3, interpret=True)
    for key in ("unitig_id", "unitig_len", "pos", "mt", "use_skew",
                "unresolved"):
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(want[key]), err_msg=key
        )


def test_pallas_capacity_fast32_mphf(cap_index):
    """MPHF engine (the 3Gbp tier): bucket ids come from the truncated
    BooPHF32 chain in XLA; the kernel handles the bounds+probe. Truncated
    lanes must surface as unresolved, exactly as the XLA path reports."""
    import jax.numpy as jnp

    from mazu_tpu.kphf.sshash import SSHash, sshash_k2u
    from mazu_tpu.index.modindex import build_uproj
    from mazu_tpu.ops.pallas_capacity import pallas_capacity_k2u

    idx = cap_index
    us = idx.k2u.unitigs
    ss = SSHash.from_unitig_set(us, idx.k2u.w, skew_param=8, engine="fast32")
    d = ss.device_arrays(prefix_kind="grouped16", pos_kind="packed")
    d["us"]["uproj"] = build_uproj(idx.u2pos, us)
    work = _work(idx, seed=7)
    for mlim in (None, 2):
        want = sshash_k2u(
            d, work, jnp, mode="main", probe_limit=2, defer_valid=True,
            mphf_level_limit=mlim,
        )
        got = pallas_capacity_k2u(
            d, jnp.asarray(work), 2, interpret=True, mphf_level_limit=mlim
        )
        for key in KEYS_UPROJ:
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]),
                err_msg=f"{key} (mlim={mlim})",
            )


def test_pallas_capacity_switch_full_query(cap_index, monkeypatch):
    """MAZU_PALLAS_CAPACITY=interpret swaps the main-phase probe inside
    get_ref_pos_compact on the grouped16+packed layout; the full
    two-phase result must stay identical."""
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import get_ref_pos_compact
    from mazu_tpu.pytree import meta as make_meta

    idx = cap_index
    arrays = jax.device_put(
        {
            "k2u": _arrays(idx),
            "u2pos": idx.u2pos.device_arrays(),
            "refs": idx.refs.device_arrays(),
            "meta": make_meta(k=idx.k, index_type=idx.index_type),
        }
    )
    us = idx.k2u.unitigs
    kms = jnp.asarray(us.get_kmer_u64(us.kmer_start_positions())[:512])
    mo = max(1, idx.max_occs())
    kw = dict(merge=False, m2=512, m2b=512, probe_limit=3, defer_valid=True)
    want = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, **kw)
    )
    monkeypatch.setenv("MAZU_PALLAS_CAPACITY", "interpret")
    got = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, **kw)
    )
    for key in ("unitig_id", "pos", "mt"):
        np.testing.assert_array_equal(got["main"][key], want["main"][key], key)
    np.testing.assert_array_equal(got["n_ovf"], want["n_ovf"])
    np.testing.assert_array_equal(got["n_ovf_b"], want["n_ovf_b"])


KEYS_USREC = (
    "unitig_id", "unitig_len", "pos", "mt", "use_skew", "unresolved",
    "occ_word", "occ_word2", "occ_cnt",
)


@pytest.mark.parametrize("plim", [2, 3])
def test_pallas_bpos_usrec_matches_xla(cap_index, plim):
    """Round 5: the DMA-ring kernel for the COMMITTED capacity config
    (bpos bucket-inline + useqrec records — the 8.1M layout) must match
    sshash_k2u's bpos+usrec main phase bit-for-bit, incl. the mt==3
    boundary sentinel surfacing as unresolved."""
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import build_useqrec
    from mazu_tpu.kphf.sshash import sshash_k2u
    from mazu_tpu.ops.pallas_capacity import pallas_bpos_usrec_k2u

    idx = cap_index
    d = idx.k2u.device_arrays(
        prefix_kind="grouped16", pos_kind="packed", bucket_inline=True
    )
    d["us"]["useqrec"] = build_useqrec(idx.u2pos, idx.k2u.unitigs)
    work = _work(idx, seed=11)
    want = sshash_k2u(d, work, jnp, mode="main", probe_limit=plim)
    got = pallas_bpos_usrec_k2u(d, jnp.asarray(work), plim, interpret=True)
    for key in KEYS_USREC:
        np.testing.assert_array_equal(
            np.asarray(got[key]), np.asarray(want[key]), err_msg=key
        )
    assert np.asarray(got["use_skew"]).any(), "no skew lanes probed"
    if plim == 2:
        assert np.asarray(got["unresolved"]).any(), "no unresolved lanes"
    assert (np.asarray(got["mt"]) > 0).any(), "no main-phase hits"


def test_pallas_bpos_switch_full_query(cap_index, monkeypatch):
    """MAZU_PALLAS_CAPACITY=interpret now routes the bpos+useqrec layout
    through the round-5 kernel inside get_ref_pos_compact; the full
    two-phase result must stay identical."""
    import jax
    import jax.numpy as jnp

    from mazu_tpu.index.modindex import build_useqrec, get_ref_pos_compact
    from mazu_tpu.pytree import meta as make_meta

    idx = cap_index
    k2u = idx.k2u.device_arrays(
        prefix_kind="grouped16", pos_kind="packed", bucket_inline=True
    )
    k2u["us"]["useqrec"] = build_useqrec(idx.u2pos, idx.k2u.unitigs)
    arrays = jax.device_put(
        {
            "k2u": k2u,
            "u2pos": idx.u2pos.device_arrays(),
            "refs": idx.refs.device_arrays(),
            "meta": make_meta(k=idx.k, index_type=idx.index_type),
        }
    )
    us = idx.k2u.unitigs
    kms = jnp.asarray(us.get_kmer_u64(us.kmer_start_positions())[:512])
    mo = max(1, idx.max_occs())
    kw = dict(merge=False, m2=512, m2b=512, probe_limit=2, probe_limit2=4)
    want = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, **kw)
    )
    monkeypatch.setenv("MAZU_PALLAS_CAPACITY", "interpret")
    got = jax.tree_util.tree_map(
        np.asarray, get_ref_pos_compact(arrays, kms, jnp, mo, **kw)
    )
    for key in ("unitig_id", "pos", "mt"):
        np.testing.assert_array_equal(got["main"][key], want["main"][key], key)
    np.testing.assert_array_equal(got["n_ovf"], want["n_ovf"])
