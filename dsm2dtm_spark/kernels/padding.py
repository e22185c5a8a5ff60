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


def pad_reflect(a: np.ndarray, radius: int, axis: int, tail: int = 0, tail_value: float = 0.0) -> np.ndarray:
    """Pad ``a`` by ``radius`` samples of symmetric reflection along ``axis``,
    plus an optional ``tail`` of constant ``tail_value`` at the end (used by
    the van Herk block layout to reach a multiple of the window size).

    Fast path (radius < n, last axis): slice copies (memcpy) instead of a
    fancy-indexed gather — this is on the PMF hot path at 10k×10k.
    """
    n = a.shape[axis]
    if axis in (-1, a.ndim - 1) and 0 < radius < n:
        out = np.empty(a.shape[:-1] + (n + 2 * radius + tail,), dtype=a.dtype)
        out[..., radius : radius + n] = a
        out[..., :radius] = a[..., radius - 1 :: -1]
        out[..., radius + n : radius + n + radius] = a[..., : -radius - 1 : -1]
        if tail:
            out[..., -tail:] = tail_value
        return out
    idx = reflect_indices(n, radius)
    out = np.take(a, idx, axis=axis)
    if tail:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, tail)
        out = np.pad(out, pad, mode="constant", constant_values=tail_value)
    return out
