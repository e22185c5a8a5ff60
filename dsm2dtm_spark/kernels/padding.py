"""Reflect ("symmetric", edge-repeated) boundary indexing shared by all kernels.

scipy.ndimage's default boundary mode is ``'reflect'``: ``(d c b a | a b c d |
d c b a)`` — the edge sample is repeated. Reference ops relying on it:
grey_opening (algorithm.py:205-206), gaussian_filter (algorithm.py:248,428).
Reimplemented from scratch; handles pad radius larger than the axis length via
the period-2n symmetric extension.
"""

from __future__ import annotations

import numpy as np


def reflect_indices(n: int, radius: int) -> np.ndarray:
    """Index map of length ``n + 2*radius`` selecting the symmetric-reflect
    extension of an axis of length ``n`` (positions ``-radius .. n+radius-1``)."""
    if n <= 0:
        raise ValueError("axis length must be positive")
    t = np.arange(-radius, n + radius, dtype=np.int64)
    if n == 1:
        return np.zeros_like(t)
    m = np.mod(t, 2 * n)  # non-negative
    return np.where(m < n, m, 2 * n - 1 - m)


def pad_reflect(a: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """Pad ``a`` by ``radius`` samples of symmetric reflection along ``axis``."""
    idx = reflect_indices(a.shape[axis], radius)
    return np.take(a, idx, axis=axis)
