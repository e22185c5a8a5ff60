"""Bilinear resampling compatible with scipy.ndimage.zoom(order=1).

Matches the reference's resize semantics (algorithm.py:77, 316, 337):
``zoom(a, scale, order=1)`` with default ``grid_mode=False``:

- output shape per axis = ``int(round(n * scale))`` (Python banker's round,
  as in scipy's ``output_shape`` computation);
- coordinate map endpoint-aligned: ``in = out_idx * (n_in - 1) / (n_out - 1)``
  (1 when n_out == 1), so corners map to corners;
- order-1 (bilinear) interpolation; coords never leave [0, n_in-1] so no
  boundary extension is involved.

Written from scratch; float64 interpolation, output cast to input dtype.
"""

from __future__ import annotations

import numpy as np


def zoom_output_shape(shape: tuple[int, int], zoom_factors: tuple[float, float]) -> tuple[int, int]:
    return tuple(int(round(n * z)) for n, z in zip(shape, zoom_factors))


def _axis_coords(n_in: int, n_out: int) -> np.ndarray:
    if n_out <= 1 or n_in <= 1:
        return np.zeros(max(n_out, 1), dtype=np.float64)
    step = (n_in - 1) / (n_out - 1)
    return np.arange(n_out, dtype=np.float64) * step


def zoom_bilinear(a: np.ndarray, zoom_factors) -> np.ndarray:
    """Resample 2-D ``a`` by ``zoom_factors`` (scalar or per-axis pair)."""
    if np.isscalar(zoom_factors):
        zoom_factors = (float(zoom_factors), float(zoom_factors))
    h, w = a.shape
    out_h, out_w = zoom_output_shape((h, w), zoom_factors)
    out_h = max(out_h, 1)
    out_w = max(out_w, 1)
    ci = _axis_coords(h, out_h)
    cj = _axis_coords(w, out_w)

    i0 = np.minimum(np.floor(ci).astype(np.int64), max(h - 2, 0))
    j0 = np.minimum(np.floor(cj).astype(np.int64), max(w - 2, 0))
    fi = (ci - i0)[:, None]
    fj = (cj - j0)[None, :]
    i1 = np.minimum(i0 + 1, h - 1)
    j1 = np.minimum(j0 + 1, w - 1)

    src = a.astype(np.float64, copy=False)
    v00 = src[np.ix_(i0, j0)]
    v01 = src[np.ix_(i0, j1)]
    v10 = src[np.ix_(i1, j0)]
    v11 = src[np.ix_(i1, j1)]
    out = (1 - fi) * ((1 - fj) * v00 + fj * v01) + fi * ((1 - fj) * v10 + fj * v11)
    return out.astype(a.dtype, copy=False)
