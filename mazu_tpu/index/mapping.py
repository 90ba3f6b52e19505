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


class ReadMapper:
    def __init__(self, index: ModIndex, batch: int = 1 << 18):
        self.index = index
        self.k = index.k
        self.batch = int(batch)
        # two-phase driver for SSHash-backed indexes; plain eager otherwise
        if index.k2u.__class__.__name__ == "SSHash":
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
