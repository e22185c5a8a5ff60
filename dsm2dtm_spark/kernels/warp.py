"""Affine reprojection (warp) with bilinear resampling, pure numpy.

Models the reference's geographic→UTM round trip (core.py:83-98 forward,
core.py:139-188 inverse): destination grids are pre-filled with nodata, each
destination pixel center is inverse-mapped through the two affine transforms,
and the source is sampled bilinearly. Source-nodata handling follows the
reference's spirit (nodata never smears into valid output): the source is
nearest-neighbor prefilled before sampling (the reference's own EDT-prefill
trick, algorithm.py:309-314) and a destination cell is masked back to nodata
when its nearest source cell is nodata.

Affine transforms use the GDAL/rasterio 6-tuple convention
``(a, b, c, d, e, f)``: ``x = a·col + b·row + c``, ``y = d·col + e·row + f``
evaluated at pixel centers (col+0.5, row+0.5).
"""

from __future__ import annotations

import numpy as np

from dsm2dtm_spark.kernels.edt import nearest_valid


class Affine:
    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a: float, b: float, c: float, d: float, e: float, f: float):
        self.a, self.b, self.c, self.d, self.e, self.f = a, b, c, d, e, f

    @classmethod
    def from_origin(cls, west: float, north: float, xres: float, yres: float) -> "Affine":
        """North-up grid anchored at its top-left corner (rasterio.from_origin)."""
        return cls(xres, 0.0, west, 0.0, -yres, north)

    def apply(self, col: np.ndarray, row: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.a * col + self.b * row + self.c, self.d * col + self.e * row + self.f

    def inverse(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        if det == 0:
            raise ValueError("singular affine transform")
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        return Affine(ia, ib, -(ia * self.c + ib * self.f), id_, ie, -(id_ * self.c + ie * self.f))


def warp_bilinear(
    src: np.ndarray,
    src_transform: Affine,
    dst_transform: Affine,
    dst_shape: tuple[int, int],
    nodata: float,
    coord_fwd=None,
    coord_inv=None,
) -> np.ndarray:
    """Resample ``src`` onto the destination grid.

    ``coord_fwd``/``coord_inv`` optionally convert between the two CRS's
    world coordinates (e.g. lon/lat ↔ projected meters); identity when the
    warp is a pure grid change. Cells mapping outside the source stay nodata.
    """
    dh, dw = dst_shape
    jj, ii = np.meshgrid(np.arange(dw, dtype=np.float64) + 0.5, np.arange(dh, dtype=np.float64) + 0.5)
    x, y = dst_transform.apply(jj, ii)
    if coord_inv is not None:
        x, y = coord_inv(x, y)
    inv = src_transform.inverse()
    sc, sr = inv.apply(x, y)  # fractional source col/row (pixel-center space)
    sc -= 0.5
    sr -= 0.5

    h, w = src.shape
    inside = (sc >= -0.5) & (sc <= w - 0.5) & (sr >= -0.5) & (sr <= h - 0.5)

    invalid = src == nodata
    if invalid.all():
        return np.full(dst_shape, nodata, dtype=src.dtype)
    if invalid.any():
        _, nr, nc = nearest_valid(invalid)
        filled = src[nr, nc]
    else:
        filled = src

    c0 = np.clip(np.floor(sc).astype(np.int64), 0, max(w - 2, 0))
    r0 = np.clip(np.floor(sr).astype(np.int64), 0, max(h - 2, 0))
    fc = np.clip(sc - c0, 0.0, 1.0)
    fr = np.clip(sr - r0, 0.0, 1.0)
    c1 = np.minimum(c0 + 1, w - 1)
    r1 = np.minimum(r0 + 1, h - 1)
    s = filled.astype(np.float64)
    val = (1 - fr) * ((1 - fc) * s[r0, c0] + fc * s[r0, c1]) + fr * ((1 - fc) * s[r1, c0] + fc * s[r1, c1])

    out = np.full(dst_shape, nodata, dtype=np.float64)
    out[inside] = val[inside]
    if invalid.any():
        # destination cells whose nearest source cell is nodata stay flagged
        nearest_r = np.clip(np.rint(sr).astype(np.int64), 0, h - 1)
        nearest_c = np.clip(np.rint(sc).astype(np.int64), 0, w - 1)
        out[inside & invalid[nearest_r, nearest_c]] = nodata
    return out.astype(src.dtype, copy=False)
