"""Sequence containers (L2 of the reference layer map)."""

from .unitig_set import UnitigSet, us_get_kmer, us_pos_to_id, us_is_valid_pos
from .refseq import RefSeqCollection

__all__ = [
    "UnitigSet",
    "RefSeqCollection",
    "us_get_kmer",
    "us_pos_to_id",
    "us_is_valid_pos",
]
