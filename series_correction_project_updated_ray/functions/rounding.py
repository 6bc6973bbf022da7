"""Oracle-compatible rounding.

numpy rounds half-to-even; DuckDB (the correctness oracle) rounds half
AWAY from zero.  Aggregates over 2-decimal inputs divided by power-of-two
counts land exactly on half boundaries (e.g. sum/32 of cents-valued data),
so the two conventions systematically diverge by one ulp-of-grid.  Every
rounded value that participates in oracle comparison uses this helper.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Element-wise round-half-away-from-zero at ``ndigits`` decimals —
    bit-matches DuckDB ``round(x, ndigits)`` on DOUBLE (verified on half
    boundaries, negatives, and epsilon-off-boundary values)."""
    scale = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out


def scaled_int(x, factor: int = 100) -> np.ndarray:
    """Exact int64 of a decimal-valued float column scaled by ``factor``
    (price → cents), rounding halves AWAY from zero like DuckDB round().

    For 2-decimal inputs x*100 never lands exactly on .5, so this agrees
    with the previous rint (half-even) scaling bit-for-bit; for arbitrary
    inputs the tie-break now matches the oracle convention too."""
    arr = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(arr) * factor + 0.5),
                       arr).astype(np.int64)
