"""Interop and ingestion (L5 of the reference layer map): cuttlefish text
formats, FASTA, pufferfish(pf1) C++ binary formats, and checkpointing."""

from .cuttlefish import CfFiles, CfInfo, CfSeqToken, iter_tiling
from .fasta import read_fasta
from . import pf1

__all__ = ["CfFiles", "CfInfo", "CfSeqToken", "iter_tiling", "read_fasta", "pf1"]
