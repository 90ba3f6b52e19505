"""Piscem index assembly: SSHash + packed occurrence table + lengths-only
refs (reference src/index/piscem_index.rs, src/index/defaults.rs)."""

from __future__ import annotations

from ..io.cuttlefish import CfFiles
from ..kphf.pfhash import PFHash
from ..kphf.sshash import SSHash
from .modindex import ModIndex, index_metadata
from .spt import SPT


def piscem_index_from_spt(
    spt: SPT, w: int, skew_param: int | None, seed: int = 0, engine: str = "parity"
) -> ModIndex:
    table = spt.piscem_table()
    if engine == "cuckoo":
        from ..kphf.kcdict import KCDict

        k2u = KCDict.from_unitig_set(spt.unitigs, occ_table=table)
    elif engine in ("mono", "mono2"):
        # the single-gather flagship engine (bench default at load 0.25)
        from ..kphf.kcdict import KCDict

        k2u = KCDict.from_unitig_set(
            spt.unitigs, occ_table=table, scheme=engine, load=0.25
        )
    else:
        k2u = SSHash.from_unitig_set(
            spt.unitigs, w, skew_param=skew_param, seed=seed, engine=engine
        )
    refs = spt.ref_seq_collection()
    return ModIndex(
        k2u, table, refs, index_type="Piscem", metadata=index_metadata(refs)
    )


def piscem_index_from_cf_prefix(
    prefix: str, w: int, skew_param: int | None = 64, seed: int = 0, engine: str = "parity"
) -> ModIndex:
    spt = SPT.from_cf(CfFiles(prefix))
    return piscem_index_from_spt(spt, w, skew_param, seed, engine)


def pufferfish_dense_index_from_cf_prefix(prefix: str) -> ModIndex:
    """PufferfishDenseIndexDefault (reference src/index/defaults.rs:16-51)."""
    spt = SPT.from_cf(CfFiles(prefix))
    k2u = PFHash.from_unitig_set(spt.unitigs)
    refs = spt.ref_seq_collection()
    return ModIndex(
        k2u, spt.dense_table(), refs, index_type="PufferfishDense", metadata=index_metadata(refs)
    )
