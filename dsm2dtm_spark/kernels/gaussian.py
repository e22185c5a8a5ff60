"""Separable Gaussian smoothing, pure numpy, scipy-compatible semantics.

Matches ``scipy.ndimage.gaussian_filter(x, sigma)`` as used by the reference
(algorithm.py:248 refine σ=5m/res; algorithm.py:428 final σ=0.5m/res): order 0,
``truncate=4.0`` → radius ``int(4σ + 0.5)``, kernel ``exp(-0.5 x²/σ²)``
normalized to sum 1, boundary mode ``'reflect'`` (symmetric, edge repeated).
Accumulation is float64; the result is cast back to the input dtype, mirroring
scipy's output-dtype contract. Written from scratch.
"""

from __future__ import annotations

import numpy as np

from dsm2dtm_spark.kernels.padding import pad_reflect

_TRUNCATE = 4.0


def gaussian_kernel1d(sigma: float, truncate: float = _TRUNCATE) -> np.ndarray:
    """Normalized 1-D Gaussian taps of radius int(truncate*sigma + 0.5)."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    if sigma <= 0:
        k = np.zeros_like(x)
        k[radius] = 1.0
        return k
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _correlate1d_reflect(a: np.ndarray, taps: np.ndarray, axis: int) -> np.ndarray:
    radius = (len(taps) - 1) // 2
    if radius == 0:
        return a.astype(np.float64, copy=True)
    transposed = axis in (-2, a.ndim - 2)
    if transposed:
        a = np.swapaxes(a, -1, -2)
    n = a.shape[-1]
    p = pad_reflect(np.ascontiguousarray(a, dtype=np.float64), radius, axis=-1)
    # symmetric kernel: fold mirrored taps together — w[r]*center + Σ w[r+d]*(left+right)
    out = p[..., radius : radius + n] * taps[radius]
    buf = np.empty_like(out)
    for d in range(1, radius + 1):
        np.add(p[..., radius - d : radius - d + n], p[..., radius + d : radius + d + n], out=buf)
        buf *= taps[radius + d]
        out += buf
    return np.swapaxes(out, -1, -2) if transposed else out


def gaussian_filter2d(a: np.ndarray, sigma: float, truncate: float = _TRUNCATE) -> np.ndarray:
    """2-D separable Gaussian blur with reflect boundary; dtype-preserving."""
    taps = gaussian_kernel1d(sigma, truncate)
    out = _correlate1d_reflect(a, taps, axis=-1)
    out = _correlate1d_reflect(out, taps, axis=-2)
    return out.astype(a.dtype, copy=False)
