"""Multi-line FASTA reader (reference src/util.rs:92-149 parity: header text
after '>' verbatim, sequence lines concatenated, no case/N processing —
N handling is the caller's choice, as in reference src/refseq.rs:38-78)."""

from __future__ import annotations

from typing import Iterator


def open_text(path: str):
    """Open a text file, transparently gunzipping ``*.gz``."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rt")
    return open(path)


def open_binary(path: str):
    """Binary variant of ``open_text`` for whole-buffer native parsers
    (one gzip.decompress beats line-by-line TextIOWrapper decoding)."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rb")
    return open(path, "rb")


def read_fasta(path: str) -> Iterator[tuple[str, str]]:
    name = None
    chunks: list[str] = []
    with open_text(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)
