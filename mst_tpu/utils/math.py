"""Scalar/array math helpers (parity: style/utils/math.py).

The vectorized versions used on the hot paths are
mst_tpu.theory.scales._normalize_dist and mst_tpu.ops.quantize.round_to_multiple;
these are the general-purpose equivalents.
"""

from __future__ import annotations

import numpy as np


def normalize_dist(dist):
    """Normalize to a probability vector; uniform fallback on zero total
    (parity: utils/math.py:4-11)."""
    dist = np.array(dist, dtype=np.float64)
    assert len(dist)
    total = dist.sum()
    if total > 0:
        return dist / total
    return np.full_like(dist, 1.0 / len(dist))


def round_number(number, precision=1):
    """Round to a multiple of ``precision``; returns (rounded, signed error)
    with exact halves rounding up (parity: utils/math.py:14-19)."""
    remainder_pos = number % precision
    remainder_neg = abs(remainder_pos - precision)
    if remainder_pos < remainder_neg:
        return number - remainder_pos, remainder_pos
    return number + remainder_neg, -remainder_neg
