"""Hash functions.

Two families:

1. BooPHF chain hashes with bit-exact parity to pufferfish's BooPHF.hpp
   (re-derived from the behavior specified by reference
   src/pf1/boophf/hash.rs and its C++-produced golden constants). These are
   required to query pufferfish-built ``mphf.bin`` files correctly.

2. ``mix64`` (in mazu_tpu.kmer) — the default minimizer-ordering hash for
   self-built SSHash indexes.

All functions are elementwise uint64 and run under NumPy or jax.numpy
(including on TPU, where XLA emulates 64-bit integer lanes).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# Default seed pair of the BooPHF single/multi hashers
# (reference src/pf1/boophf/hash.rs:9)
BOOPHF_SEED0 = U64(0xAAAAAAAA55555555)
BOOPHF_SEED1 = U64(0x33333333CCCCCCCC)

_M32 = U64(0xFFFFFFFF)


def simplehash64(key, seed):
    """SingleHashFunctor<uint64_t> mix (reference src/pf1/boophf/hash.rs:33-49).

    All arithmetic wraps mod 2^64 (native uint64 overflow).
    """
    h = U64(seed) if np.isscalar(seed) else seed
    key = key.astype(np.uint64) if hasattr(key, "astype") else U64(key)
    init = (h << U64(7)) ^ (key * (h >> U64(3))) ^ (~((h << U64(11)) + (key ^ (h >> U64(5)))))
    h = h ^ init
    h = (~h) + (h << U64(21))
    h = h ^ (h >> U64(24))
    h = (h + (h << U64(3))) + (h << U64(8))
    h = h ^ (h >> U64(14))
    h = (h + (h << U64(2))) + (h << U64(4))
    h = h ^ (h >> U64(28))
    h = h + (h << U64(31))
    return h


def multihash_h0(key):
    """Level-0 hash; returns (hash, state0, state1)."""
    h = simplehash64(key, BOOPHF_SEED0)
    ones = h * U64(0) + BOOPHF_SEED1  # broadcast seed1 to key's shape/backend
    return h, h, ones


def multihash_h1(state0, state1, key):
    h = simplehash64(key, BOOPHF_SEED1)
    return h, state0, h


def multihash_next(state0, state1):
    """xorshift128+ chain step (reference src/pf1/boophf/hash.rs:124-135)."""
    s1 = state0
    s0 = state1
    s1 = s1 ^ (s1 << U64(23))
    s1 = s1 ^ s0 ^ (s1 >> U64(17)) ^ (s0 >> U64(26))
    h = s1 + s0
    return h, s0, s1


def mulhi64(a, b):
    """High 64 bits of the 128-bit product a*b, via 32-bit limb decomposition.

    Used by BooPHF's Lemire fast_range_64 (reference src/pf1/boophf/mod.rs:136-144).
    """
    a_lo = a & _M32
    a_hi = a >> U64(32)
    if np.isscalar(b) or isinstance(b, (int, np.integer)):
        b = U64(b)
    b_lo = b & _M32
    b_hi = b >> U64(32)
    lo_lo = a_lo * b_lo
    hi_lo = a_hi * b_lo
    lo_hi = a_lo * b_hi
    hi_hi = a_hi * b_hi
    cross = (lo_lo >> U64(32)) + (hi_lo & _M32) + (lo_hi & _M32)
    return hi_hi + (hi_lo >> U64(32)) + (lo_hi >> U64(32)) + (cross >> U64(32))


def fast_range_64(word, p):
    """Map ``word`` into [0, p) multiplicatively (Lemire fastrange)."""
    return mulhi64(word, p)
