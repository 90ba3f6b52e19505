"""Multi-chip query sharding over a jax Mesh."""

from .sharding import (
    make_data_parallel_query,
    make_bucket_sharded_query,
    shard_sshash_buckets,
)

__all__ = [
    "make_data_parallel_query",
    "make_bucket_sharded_query",
    "shard_sshash_buckets",
]
