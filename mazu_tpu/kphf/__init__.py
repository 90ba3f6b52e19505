"""K2U dictionaries (L3a of the reference layer map): minimal perfect hash
functions and k-mer -> (unitig, pos, orientation) lookups.

- ``boophf``: BBHash-style MPHF — byte-parity loader for pufferfish
  ``mphf.bin`` files, a vectorized host-side builder, and an O(levels)
  gather-based device query kernel.
- ``sshash``: minimizer-bucketed dictionary (SSHash-style) — host builder +
  fused batched device query.
- ``pfhash``: pufferfish-style dense dictionary (MPHF over all k-mers) and
  the load-only SampledPFHash (sparse).
"""

from .boophf import BooPHF, boophf_lookup
from .pfhash import PFHash, pfhash_k2u
from .sshash import SSHash, sshash_k2u

__all__ = [
    "BooPHF",
    "boophf_lookup",
    "PFHash",
    "pfhash_k2u",
    "SSHash",
    "sshash_k2u",
]
