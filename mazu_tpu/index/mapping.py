"""Read mapping: the production serving driver.

Reads -> (native C++) k-merization -> batched fused two-phase query ->
per-read per-k-mer reference hits. This is the end-to-end flow the
reference exposes through its bench/validate CLIs, packaged as a serving
API.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .modindex import ModIndex
from .twophase import TwoPhaseIndexQuery
from .validate import valid_kmer_windows


@dataclass
class ReadHits:
    """Hits of one read: parallel arrays over its valid k-mer windows."""

    read_pos: np.ndarray  # int64[n_kmers] position of the k-mer in the read
    hits: list  # per k-mer: None (miss) or list[(ref_id, ref_pos, orient)]

    @property
    def n_kmers(self) -> int:
        return len(self.read_pos)

    @property
    def n_hit(self) -> int:
        return sum(h is not None for h in self.hits)


class CompactQuery:
    """Capacity-tier serving driver: packed IntVector positions + compact
    two-phase query with the measured-best knobs (index/tuning.py). This
    is how Gbp-scale indexes serve — the speed-tier inline rows would be
    8+ GB/Gbp and OOM the chip (STATUS round 3)."""

    def __init__(self, index: ModIndex, cfg, device=None):
        import jax
        import jax.numpy as jnp

        from .modindex import get_ref_pos_compact

        self.max_occs = mo = max(1, index.max_occs())
        self.arrays = jax.device_put(
            index.device_arrays(**cfg.arrays_kwargs()), device
        )
        qk = cfg.query_kwargs()

        from functools import partial

        @partial(jax.jit, static_argnums=2)
        def q(arrays, fw, m2):
            return get_ref_pos_compact(arrays, fw, jnp, mo, m2=int(m2), **qk)

        self._q = q
        self._jnp = jnp

    def get_ref_pos_eager(self, fw_words: np.ndarray) -> list:
        import jax

        fw = self._jnp.asarray(np.asarray(fw_words, dtype=np.uint64))
        m2 = max(1024, len(fw_words) // 4)
        out = jax.device_get(self._q(self.arrays, fw, m2))
        if bool(out["over_budget"]):  # rare: recompile with full budget
            out = jax.device_get(self._q(self.arrays, fw, max(1024, len(fw_words))))
            assert not bool(out["over_budget"])
        res: list = []
        for i in range(len(fw_words)):
            if out["mt"][i] == 0:
                res.append(None)
                continue
            res.append(
                [
                    (
                        int(out["ref_id"][i, j]),
                        int(out["ref_pos"][i, j]),
                        int(out["orient"][i, j]),
                    )
                    for j in range(int(out["n_occs"][i]))
                ]
            )
        return res


class ReadMapper:
    def __init__(self, index: ModIndex, batch: int = 1 << 18):
        self.index = index
        self.k = index.k
        self.batch = int(batch)
        # driver by measured tier: speed-tier SSHash -> fused two-phase;
        # capacity-tier SSHash (index too big for inline rows) -> compact
        # two-phase with tuned knobs; other K2Us -> plain eager
        if index.k2u.__class__.__name__ == "SSHash":
            from .tuning import tuned_query_config

            cfg = tuned_query_config(index.k2u)
            if cfg.tier == "capacity":
                self.tp = CompactQuery(index, cfg)
            else:
                self.tp = TwoPhaseIndexQuery(index)
        else:
            self.tp = index

    def map_reads(self, reads: list[str]) -> list[ReadHits]:
        k = self.k
        positions = []
        words = []
        bounds = [0]
        for r in reads:
            p, w = valid_kmer_windows(r, k)
            positions.append(p)
            words.append(w)
            bounds.append(bounds[-1] + len(w))
        flat = np.concatenate(words) if words else np.zeros(0, dtype=np.uint64)

        all_hits: list = []
        for s in range(0, len(flat), self.batch):
            chunk = flat[s : s + self.batch]
            all_hits.extend(self.tp.get_ref_pos_eager(chunk))

        out = []
        for i in range(len(reads)):
            out.append(ReadHits(positions[i], all_hits[bounds[i] : bounds[i + 1]]))
        return out

    def map_fasta(self, path: str) -> list[ReadHits]:
        from ..io.fasta import read_fasta

        return self.map_reads([seq for _, seq in read_fasta(path)])

    def map_file(self, path: str) -> list[ReadHits]:
        """FASTA or FASTQ (optionally gzipped), format-sniffed."""
        from ..io.fastq import read_seqs

        return self.map_reads([seq for _, seq in read_seqs(path)])
