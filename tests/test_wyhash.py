"""wyhash-v1 minimizer-ordering parity option (reference src/kphf/mod.rs:32-52,
wyhash crate 0.5 via Cargo.toml:20).

The digest implementation is a reconstruction of the published wyhash v1
algorithm (see the provenance note in mazu_tpu/hashes.py): the vectors here
pin THIS implementation against regressions and against its scalar byte-
buffer oracle; they are not upstream-crate goldens (no network / no Rust
toolchain in this environment). Ordering choice never changes query
answers, which the build/query tests below assert directly.
"""

import os

import numpy as np
import pytest

from mazu_tpu.containers.unitig_set import UnitigSet
from mazu_tpu.hashes import wyhash_bytes, wyhash_u64
from mazu_tpu.index.validate import validate_k2u_self
from mazu_tpu.io.cuttlefish import CfFiles
from mazu_tpu.kphf.sshash import SSHash, sshash_k2u

from conftest import TEST_DATA

TINY = os.path.join(TEST_DATA, "cf", "tiny", "tiny")

# Frozen vectors: wyhash_u64(x, seed) == wyhash-v1(le_bytes(x), seed).
# (self-pinned; regenerate ONLY if upstream verification shows a deviation)
VECTORS = [
    (0x0000000000000000, 0, 0x758026CCFDD6ED2D),
    (0x0000000000000001, 0, 0xA4D7B15CEEBADBE3),
    (0x0000000000000000, 7, 0x7434B06AC31B53BB),
    (0x0000000000000001, 7, 0x0EC1EFE73CBA212A),
    (0xDEADBEEFCAFEF00D, 7, 0xAA2C1F31B14687D8),
    (0xFFFFFFFFFFFFFFFF, 7, 0x92314B615760858C),
]


def test_wyhash_u64_frozen_vectors():
    for x, seed, want in VECTORS:
        got = int(wyhash_u64(np.uint64(x), seed))
        assert got == want, (hex(x), seed, hex(got), hex(want))


def test_wyhash_u64_matches_scalar_oracle():
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 1 << 63, 200, dtype=np.uint64) | (
        rng.integers(0, 2, 200, dtype=np.uint64) << np.uint64(63)
    )
    for seed in (0, 1, 0x123456789):
        vec = wyhash_u64(xs, seed)
        for x, v in zip(xs, vec):
            assert int(v) == wyhash_bytes(int(x).to_bytes(8, "little"), seed)


def test_wyhash_bytes_long_buffer_loops():
    # exercise the 32-byte wymum rounds + 8-byte tail of the scalar oracle
    data = bytes(range(40))
    h1 = wyhash_bytes(data, 3)
    h2 = wyhash_bytes(data, 4)
    assert h1 != h2 and h1 != 0
    with pytest.raises(NotImplementedError):
        wyhash_bytes(bytes(9), 0)


@pytest.fixture(scope="module")
def tiny_unitigs():
    if not os.path.exists(TINY + ".cf_seg"):
        pytest.skip("tiny cf fixture missing")
    us, _ = UnitigSet.from_cf(CfFiles(TINY))
    return us


def test_sshash_wyhash_ordering_build_and_query(tiny_unitigs):
    ss_wy = SSHash.from_unitig_set(
        tiny_unitigs, w=3, skew_param=4, minimizer_hash="wyhash"
    )
    assert ss_wy.ordering == "wyhash"
    validate_k2u_self(ss_wy)

    # query answers are ordering-independent: exact agreement with mix64
    ss_mx = SSHash.from_unitig_set(tiny_unitigs, w=3, skew_param=4)
    d_wy, d_mx = ss_wy.device_arrays(), ss_mx.device_arrays()
    rng = np.random.default_rng(5)
    k = tiny_unitigs.k
    q = rng.integers(0, np.uint64(1) << np.uint64(2 * k), 512, dtype=np.uint64)
    r_wy = sshash_k2u(d_wy, q, np)
    r_mx = sshash_k2u(d_mx, q, np)
    for key in ("unitig_id", "unitig_len", "pos", "mt"):
        assert np.array_equal(r_wy[key], r_mx[key]), key


def test_sshash_wyhash_checkpoint_roundtrip(tiny_unitigs, tmp_path):
    from mazu_tpu.io.checkpoint import load_k2u, save_k2u

    ss = SSHash.from_unitig_set(tiny_unitigs, w=5, minimizer_hash="wyhash")
    p = str(tmp_path / "wy.npz")
    save_k2u(ss, p)
    back = load_k2u(p)
    assert back.ordering == "wyhash"
    validate_k2u_self(back)


def test_minimizer_hash_rejected_for_fast_engines(tiny_unitigs):
    with pytest.raises(ValueError):
        SSHash.from_unitig_set(
            tiny_unitigs, w=3, engine="fast32", minimizer_hash="wyhash"
        )
