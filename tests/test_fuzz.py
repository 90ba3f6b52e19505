"""Property tests: random unitig sets (with deliberately shared/repeated
content and reverse-complement overlaps) must self-validate under every
engine and every layout, and all engines must agree query-for-query."""

import numpy as np
import pytest

from mazu_tpu.containers.unitig_set import UnitigSet
from mazu_tpu.index.validate import validate_k2u_self
from mazu_tpu.kmer import revcomp
from mazu_tpu.kphf.sshash import SSHash, sshash_k2u

BASES = np.array(list("ACGT"))
COMP = str.maketrans("ACGT", "TGCA")


def random_unitigs(rng, n_seqs, k, min_len=None, max_len=120, share=True):
    min_len = min_len or k
    seqs = []
    for i in range(n_seqs):
        L = int(rng.integers(min_len, max_len + 1))
        s = "".join(rng.choice(BASES, L))
        seqs.append(s)
    if share and n_seqs >= 4:
        # inject shared windows and revcomp copies (stresses minimizer
        # sharing and canonical handling); keep all k-mers distinct enough
        # by mutating one base
        donor = seqs[0]
        if len(donor) > k + 2:
            ins = donor[1 : k + 2]
            seqs[1] = ins + seqs[1][len(ins) :] if len(seqs[1]) > len(ins) else seqs[1]
            seqs[2] = seqs[2][: -len(ins)] + ins[::-1].translate(COMP) if len(seqs[2]) > len(ins) else seqs[2]
    # dedup canonical k-mers across set (dBG property): drop seqs that collide
    seen = set()
    out = []
    for s in seqs:
        words = []
        ok = True
        from mazu_tpu.kmer import kmer_from_str

        for p in range(len(s) - k + 1):
            w = int(kmer_from_str(s[p : p + k]))
            c = min(w, int(revcomp(np.uint64(w), k)))
            if c in seen:
                ok = False
                break
            words.append(c)
        if ok:
            seen.update(words)
            out.append(s)
    return out


@pytest.mark.parametrize("trial", range(6))
def test_random_unitig_sets_all_engines(trial):
    rng = np.random.default_rng(100 + trial)
    k = int(rng.choice([7, 15, 21, 31]))
    w = int(rng.integers(3, min(k, 16) + 1))
    seqs = random_unitigs(rng, int(rng.integers(3, 12)), k)
    if not seqs:
        pytest.skip("degenerate draw")
    us = UnitigSet.from_seqs(seqs, k)
    skew = int(rng.choice([0, 2, 5]))

    pos = us.kmer_start_positions()
    kms = us.get_kmer_u64(pos)
    # add misses + rc queries (misses drawn within 2k bits: the K2U contract)
    queries = np.concatenate(
        [kms, revcomp(kms, k), rng.integers(0, 1 << min(2 * k, 62), 20, dtype=np.uint64)]
    )
    results = {}
    for engine in ("parity", "fast32", "direct"):
        ss = SSHash.from_unitig_set(us, w, skew_param=skew, engine=engine)
        validate_k2u_self(ss)
        r = sshash_k2u(ss.device_arrays(), queries, np)
        results[engine] = {kk: np.asarray(v) for kk, v in r.items() if kk != "use_skew"}

    from mazu_tpu.kphf.kcdict import KCDict, kcdict_k2u

    kc = KCDict.from_unitig_set(us)
    validate_k2u_self(kc)
    rk = kcdict_k2u(kc.device_arrays(), queries, np)
    results["cuckoo"] = {kk: np.asarray(v) for kk, v in rk.items()}

    # all engines agree on every query (including misses)
    for eng in ("fast32", "direct", "cuckoo"):
        for key in ("unitig_id", "unitig_len", "pos", "mt"):
            hit = results["parity"]["mt"] > 0
            np.testing.assert_array_equal(
                results[eng]["mt"] > 0, hit, err_msg=f"{eng} hit-set"
            )
            np.testing.assert_array_equal(
                results[eng][key][hit], results["parity"][key][hit], err_msg=f"{eng}/{key}"
            )
