"""TPU-fast prefix sums.

XLA lowers 1-D cumsum on TPU as a sequence of shifted adds, each forcing a
lane relayout — measured ~28 ms for 1M int32 on a v5e regardless of the
algorithm (jnp.cumsum, Hillis-Steele, associative_scan all equal). The MXU
does the same job as triangular matmuls: reshape to [N/B, B], in-block
inclusive scan = x @ upper_triangular_ones, then a hierarchical scan of
block totals. ~8x less wall time; used by the compaction/ranking kernels
in the query path.

EXACTNESS CONTRACT: float32 matmul passes (precision=HIGHEST — the TPU
default would feed the MXU bf16 inputs) are exact only while every
intermediate stays below 2^24. The caller therefore passes ``max_value``
(a static bound on the input elements); the matmul path engages per level
only while ``256 * level_max < 2^24``, falling back to plain cumsum
otherwise. Without ``max_value`` the op is always plain cumsum (correct,
slow on TPU).
"""

from __future__ import annotations

import numpy as np

_B = 256
_EXACT = 1 << 24


def _tri(xp, dtype):
    # U[i, j] = 1 for i <= j: (x @ U)[j] = sum_{i<=j} x[i]
    i = np.arange(_B)
    return xp.asarray((i[:, None] <= i[None, :]).astype(dtype))


def prefix_sum(x, xp, inclusive: bool = True, max_value: int | None = None):
    """Inclusive (default) or exclusive prefix sum of integer ``x`` along
    axis 0. ``x`` may be [N] or [N, C] (C independent channels scanned in
    the SAME MXU passes — a 2-channel scan costs ~1.3x one channel, not
    2x; the compaction kernels use this to rank two flag sets at once).
    ``max_value``: static upper bound on the elements — enables the MXU
    fast path (see module docstring). The TOTAL must fit the input dtype
    regardless."""
    if xp is np:
        s = np.cumsum(x, axis=0)
        if inclusive:
            return s.astype(x.dtype)
        return (s - x).astype(x.dtype)

    n = x.shape[0]
    if (
        max_value is None
        or n <= _B
        or n % _B
        or max_value <= 0
        or max_value * _B >= _EXACT
    ):
        s = xp.cumsum(x, axis=0)
        return s if inclusive else s - x

    import jax

    dt = x.dtype
    tri = _tri(xp, np.float32)
    if x.ndim == 2:
        C = x.shape[1]
        # [N, C] -> [C, n/B, B]: each channel's blocks scan in one batched
        # matmul; channel-major keeps every block contiguous
        xb = x.T.reshape(C, n // _B, _B).astype(xp.float32)
        intra = jax.numpy.matmul(
            xb, tri, precision=jax.lax.Precision.HIGHEST
        ).astype(dt)
        totals = intra[:, :, -1].T  # [n/B, C]
        off = prefix_sum(totals, xp, inclusive=False, max_value=max_value * _B)
        s = (intra + off.T[:, :, None]).reshape(C, n).T
        return s if inclusive else s - x
    xb = x.reshape(n // _B, _B).astype(xp.float32)
    # HIGHEST precision: true-f32 matmul passes — the TPU default feeds the
    # MXU bfloat16 INPUTS, which silently rounds integer values > 256
    intra = jax.numpy.matmul(xb, tri, precision=jax.lax.Precision.HIGHEST)
    intra = intra.astype(dt)  # block sums < 2^24: exact in f32, exact cast
    totals = intra[:, -1]  # [n/B], elements <= B * max_value
    off = prefix_sum(totals, xp, inclusive=False, max_value=max_value * _B)
    s = (intra + off[:, None]).reshape(-1)
    return s if inclusive else s - x
