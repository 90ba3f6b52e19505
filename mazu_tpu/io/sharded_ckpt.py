"""Sharded fused-index checkpoints: the >HBM multi-chip deployment path.

The single-file checkpoint (io/checkpoint.py — analog of the reference's
bincode whole-index files, src/bin/index/main.rs:103-124) rebuilds the whole
index on one host and one device. Past HBM scale that is impossible by
definition: this module saves the bucket-sharded fused device layout
(parallel/sharding.shard_fused_arrays) as ONE ``.npz`` PER SHARD plus a
replicated ``shared.npz``, and loads it back placing each shard's arrays
directly onto its device row with
``jax.make_array_from_single_device_arrays`` — the full index is never
materialized on any single device, and a multi-host launch only reads the
shard files its addressable devices own.

Layout on disk::

    <dir>/manifest.json   n_shards, pos_kind, max_occs, dtypes/shapes
    <dir>/shared.npz      replicated arrays (unitig seq, skew rows, ...)
    <dir>/meta.json       static Meta nodes of the shared pytree
    <dir>/shard_<s>.npz   shard s's fused rows / prefix / ctable slices
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..pytree import Meta, meta as make_meta


# ------------------------------------------------------------- Meta <-> json
def _enc(v):
    if isinstance(v, Meta):
        return {"__meta__": [[k, _enc(x)] for k, x in v.kv]}
    if isinstance(v, tuple):
        return {"__tuple__": [_enc(x) for x in v]}
    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    if isinstance(v, np.integer):
        return int(v)
    raise TypeError(f"unserializable meta value: {type(v)}")


def _dec(v):
    if isinstance(v, dict) and "__meta__" in v:
        return Meta(tuple((k, _dec(x)) for k, x in v["__meta__"]))
    if isinstance(v, dict) and "__tuple__" in v:
        return tuple(_dec(x) for x in v["__tuple__"])
    return v


def _split(tree, prefix, arrays, metas):
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Meta):
            metas[key] = _enc(v)
        elif isinstance(v, dict):
            _split(v, key, arrays, metas)
        else:
            arrays[key] = np.asarray(v)


def _join(arrays, metas):
    root: dict = {}

    def put(key, v):
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v

    for k, v in arrays.items():
        put(k, v)
    for k, v in metas.items():
        put(k, _dec(v))
    return root


# ------------------------------------------------------------------- save
def _save_sharded(dirpath: str, shared, stacked, n_shards: int, extra: dict):
    os.makedirs(dirpath, exist_ok=True)
    arrays: dict = {}
    metas: dict = {}
    _split(shared, "", arrays, metas)
    np.savez_compressed(os.path.join(dirpath, "shared.npz"), **arrays)
    with open(os.path.join(dirpath, "meta.json"), "w") as f:
        json.dump(metas, f)
    leaf_names = [k for k in stacked]
    for s in range(n_shards):
        np.savez_compressed(
            os.path.join(dirpath, f"shard_{s}.npz"),
            **{k: stacked[k][s] for k in leaf_names},
        )
    manifest = {
        "format_version": 1,
        "n_shards": int(n_shards),
        "leaves": {
            k: {"shape": list(stacked[k].shape), "dtype": str(stacked[k].dtype)}
            for k in leaf_names
        },
        **extra,
    }
    with open(os.path.join(dirpath, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def save_fused_sharded(
    dirpath: str, index, n_shards: int, pos_kind: str = "inline2"
) -> None:
    """Partition ``index`` into ``n_shards`` fused bucket shards and write
    the sharded checkpoint directory."""
    from ..parallel.sharding import shard_fused_arrays

    shared, stacked = shard_fused_arrays(index, n_shards, pos_kind=pos_kind)
    _save_sharded(
        dirpath,
        shared,
        stacked,
        n_shards,
        {
            "kind": "fused",
            "pos_kind": pos_kind,
            "max_occs": int(max(1, index.max_occs())),
        },
    )


def save_compact_sharded(
    dirpath: str,
    index,
    n_shards: int,
    bucket_inline: bool = False,
    useqrec: bool = False,
) -> None:
    """Partition a CAPACITY-tier index (direct engine + packed positions —
    the multi-Gbp layout) into bucket shards and write the sharded
    checkpoint directory (manifest kind="compact"). This is the >HBM
    deployment path for genomes past one chip even in compact form.

    ``bucket_inline``/``useqrec`` (round 5): persist the gather-op-diet
    layouts (sharded bpos table / replicated window records — the
    committed 8.1M single-chip config, see shard_compact_arrays); the
    loader wires them automatically from their presence in the files."""
    from ..parallel.sharding import shard_compact_arrays

    shared, stacked = shard_compact_arrays(
        index, n_shards, bucket_inline=bucket_inline, useqrec=useqrec
    )
    _save_sharded(
        dirpath,
        shared,
        stacked,
        n_shards,
        {
            "kind": "compact",
            "max_occs": int(max(1, index.max_occs())),
            "bucket_inline": bool(bucket_inline),
            "useqrec": bool(useqrec),
        },
    )


def save_mono_sharded(dirpath: str, index, n_shards: int) -> None:
    """Partition a mono/mono2 KCDict index into bucket shards and write the
    sharded checkpoint directory (same layout as the fused variant; the
    manifest records kind="mono")."""
    from ..parallel.sharding import shard_mono_arrays

    shared, stacked = shard_mono_arrays(index, n_shards)
    _save_sharded(
        dirpath,
        shared,
        stacked,
        n_shards,
        {"kind": "mono", "max_occs": int(max(1, index.max_occs()))},
    )


# ------------------------------------------------------------------- load
def load_manifest(dirpath: str) -> dict:
    with open(os.path.join(dirpath, "manifest.json")) as f:
        return json.load(f)


def load_shared(dirpath: str) -> dict:
    """Replicated part of the checkpoint as a host pytree (Meta nodes
    restored into the treedef)."""
    with np.load(os.path.join(dirpath, "shared.npz"), allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    with open(os.path.join(dirpath, "meta.json")) as f:
        metas = json.load(f)
    return _join(arrays, metas)


def load_shard(dirpath: str, s: int) -> dict:
    with np.load(
        os.path.join(dirpath, f"shard_{s}.npz"), allow_pickle=False
    ) as z:
        return {k: z[k] for k in z.files}


def device_put_fused_sharded(
    dirpath: str, mesh, bucket_axis: str = "bucket"
):
    """Load a sharded checkpoint ONTO a mesh: the replicated part goes
    everywhere; each shard file is read once and its arrays are placed
    directly on the devices of that shard's mesh row —
    ``jax.make_array_from_single_device_arrays`` assembles the globally
    sharded arrays without ever holding the full index on one device (or,
    multi-host, on one host: only addressable rows' files are read).

    Returns ``(shared_host, shared_dev, stacked_dev, manifest)``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    manifest = load_manifest(dirpath)
    S = int(manifest["n_shards"])
    assert mesh.shape[bucket_axis] == S, (mesh.shape, S)
    shared_host = load_shared(dirpath)
    shared_dev = jax.device_put(shared_host, NamedSharding(mesh, P()))

    ax = list(mesh.axis_names).index(bucket_axis)
    rows: dict[int, list] = {}
    for coords in np.ndindex(*mesh.devices.shape):
        rows.setdefault(int(coords[ax]), []).append(mesh.devices[coords])

    sharding = NamedSharding(mesh, P(bucket_axis))
    bufs = {name: [] for name in manifest["leaves"]}
    for s in range(S):
        local = None
        for dev in rows[s]:
            if getattr(dev, "process_index", 0) != jax.process_index():
                continue  # another host owns this row's replica
            if local is None:
                local = load_shard(dirpath, s)
            for name in bufs:
                bufs[name].append(jax.device_put(local[name][None], dev))
    stacked_dev = {}
    for name, info in manifest["leaves"].items():
        stacked_dev[name] = jax.make_array_from_single_device_arrays(
            tuple(info["shape"]), sharding, bufs[name]
        )
    return shared_host, shared_dev, stacked_dev, manifest


def make_fused_sharded_query_from_ckpt(
    dirpath: str,
    mesh,
    m2: int,
    probe_limit: int | None = 2,
    data_axis: str = "data",
    bucket_axis: str = "bucket",
):
    """Checkpoint -> jitted bucket-sharded FULL query (same semantics as
    parallel.sharding.make_fused_sharded_query) with per-device placement
    from disk."""
    from ..parallel.sharding import build_fused_sharded_query

    shared_host, shared_dev, stacked_dev, manifest = device_put_fused_sharded(
        dirpath, mesh, bucket_axis=bucket_axis
    )
    assert manifest.get("kind", "fused") == "fused", manifest.get("kind")
    return build_fused_sharded_query(
        shared_host,
        shared_dev,
        stacked_dev,
        mesh,
        m2=m2,
        max_occs=int(manifest["max_occs"]),
        probe_limit=probe_limit,
        data_axis=data_axis,
        bucket_axis=bucket_axis,
    )


def make_mono_sharded_query_from_ckpt(
    dirpath: str,
    mesh,
    m2: int,
    data_axis: str = "data",
    bucket_axis: str = "bucket",
):
    """Mono checkpoint -> jitted bucket-sharded FULL query (same semantics
    as parallel.sharding.make_mono_sharded_query) with per-device placement
    from disk."""
    from ..parallel.sharding import build_mono_sharded_query

    shared_host, shared_dev, stacked_dev, manifest = device_put_fused_sharded(
        dirpath, mesh, bucket_axis=bucket_axis
    )
    assert manifest.get("kind") == "mono", manifest.get("kind")
    return build_mono_sharded_query(
        shared_host,
        shared_dev,
        stacked_dev,
        mesh,
        m2=m2,
        max_occs=int(manifest["max_occs"]),
        data_axis=data_axis,
        bucket_axis=bucket_axis,
    )


def make_compact_sharded_query_from_ckpt(
    dirpath: str,
    mesh,
    m2: int,
    probe_limit: int | None = 3,
    defer_valid: bool = True,
    data_axis: str = "data",
    bucket_axis: str = "bucket",
):
    """Compact (capacity-tier) checkpoint -> jitted bucket-sharded full
    query (same semantics as parallel.sharding.make_compact_sharded_query)
    with per-device placement from disk."""
    from ..parallel.sharding import build_compact_sharded_query

    shared_host, shared_dev, stacked_dev, manifest = device_put_fused_sharded(
        dirpath, mesh, bucket_axis=bucket_axis
    )
    assert manifest.get("kind") == "compact", manifest.get("kind")
    return build_compact_sharded_query(
        shared_host,
        shared_dev,
        stacked_dev,
        mesh,
        m2=m2,
        max_occs=int(manifest["max_occs"]),
        probe_limit=probe_limit,
        defer_valid=defer_valid,
        data_axis=data_axis,
        bucket_axis=bucket_axis,
    )
