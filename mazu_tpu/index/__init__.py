"""Modular index & query engine (L4 of the reference layer map)."""

from .unitig_table import DenseUnitigTable, PiscemUnitigTable, decode_occs
from .modindex import ModIndex, k2u_batch, get_ref_pos_padded, get_ref_pos_csr
from .spt import SPT
from .validate import validate_self, validate_fasta

__all__ = [
    "DenseUnitigTable",
    "PiscemUnitigTable",
    "decode_occs",
    "ModIndex",
    "k2u_batch",
    "get_ref_pos_padded",
    "get_ref_pos_csr",
    "SPT",
    "validate_self",
    "validate_fasta",
]
