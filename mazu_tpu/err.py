"""Error hierarchy (reference parity: src/err.rs Error enum)."""

from __future__ import annotations


class MazuError(Exception):
    """Base error."""


class EFNotMonotone(MazuError, ValueError):
    """Elias-Fano input sequence not monotone (reference EFNotMonotone)."""


class EFEmpty(MazuError, ValueError):
    """Elias-Fano of an empty sequence (reference EFEmpty)."""


class InvalidData(MazuError, ValueError):
    """Malformed input data (reference InvalidData)."""


class IndexLoad(MazuError, IOError):
    """Failed to load a serialized index (reference IndexLoad)."""


class CfSeqTokenParseError(MazuError, ValueError):
    """Malformed cuttlefish tiling token (reference CfSeqTokenParseError)."""


class TruncatedFile(MazuError, IOError):
    """Binary file shorter than its declared contents."""
