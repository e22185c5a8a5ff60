"""S2-style hierarchical cell index, from scratch (SURVEY.md E3).

No h3/s2 library exists offline, so the engine defines its own quadtree cell
id with S2-like semantics: an equirectangular lat/lng grid at resolution
``r`` (2^r × 2^r cells), Morton/Z-order interleaved into an int64:

    cell_id = (interleave(ix, iy) << 5) | r        r ∈ [0, 26]

Three equivalent implementations, cross-tested bit-for-bit:

- ``encode_cells``      vectorized numpy (used inside pandas UDFs);
- ``cell_expr``         a pyspark Column expression (JVM-side, codegen-able);
- ``cell_encode_sql``   one SQL string valid in BOTH Spark SQL and DuckDB
                        (shifts spelled as multiplies, masks as decimal
                        literals) — this is what makes every cell-keyed join
                        oracle-checkable.

The id is hierarchical: ``parent_cell`` truncates the Morton code by 2 bits
per level, so coarse-level pruning is a bit-shift, as in S2.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

MAX_RES = 26

_MASKS = (
    0x0000FFFF0000FFFF,
    0x00FF00FF00FF00FF,
    0x0F0F0F0F0F0F0F0F,
    0x3333333333333333,
    0x5555555555555555,
)
_SHIFTS = (16, 8, 4, 2, 1)


# ------------------------------------------------------------------ numpy


def _spread_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    for s, m in zip(_SHIFTS, _MASKS):
        x = (x | (x << np.uint64(s))) & np.uint64(m)
    return x


def _compact_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(_MASKS[-1])
    for s, m in zip(reversed(_SHIFTS), (_MASKS[3], _MASKS[2], _MASKS[1], _MASKS[0], np.uint64(0x3FFFFFF))):
        x = (x | (x >> np.uint64(s))) & np.uint64(m)
    return x


def grid_coords(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << res
    ix = np.clip(np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix, iy


def encode_cells(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """int64 cell ids for lon/lat arrays at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix, iy = grid_coords(lon, lat, res)
    morton = _spread_np(ix) | (_spread_np(iy) << np.uint64(1))
    return ((morton << np.uint64(5)) | np.uint64(res)).astype(np.int64)


def encode_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    morton = _spread_np(np.asarray(ix)) | (_spread_np(np.asarray(iy)) << np.uint64(1))
    return ((morton << np.uint64(5)) | np.uint64(res)).astype(np.int64)


def decode_cells(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell_id → (ix, iy, res)."""
    c = np.asarray(cell_id).astype(np.uint64)
    res = (c & np.uint64(31)).astype(np.int64)
    morton = c >> np.uint64(5)
    ix = _compact_np(morton).astype(np.int64)
    iy = _compact_np(morton >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def cell_center(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon, lat) of each cell."""
    ix, iy, res = decode_cells(cell_id)
    n = (np.int64(1) << res).astype(np.float64)
    lon = (ix + 0.5) / n * 360.0 - 180.0
    lat = (iy + 0.5) / n * 180.0 - 90.0
    return lon, lat


def parent_cell(cell_id: np.ndarray, parent_res: int) -> np.ndarray:
    """Ancestor cell at a coarser resolution (S2-style truncation)."""
    c = np.asarray(cell_id).astype(np.uint64)
    res = (c & np.uint64(31)).astype(np.int64)
    morton = c >> np.uint64(5)
    drop = (2 * (res - parent_res)).astype(np.uint64)
    return (((morton >> drop) << np.uint64(5)) | np.uint64(parent_res)).astype(np.int64)


def ring_cells(cell_id: int, radius: int) -> np.ndarray:
    """All cells within Chebyshev distance ``radius`` of ``cell_id`` (the
    (2r+1)² block, clipped at the grid edge) — the kNN ring-expansion
    candidate set (SURVEY.md E7)."""
    ix, iy, res = decode_cells(np.asarray([cell_id]))
    n = 1 << int(res[0])
    xs = np.arange(max(0, ix[0] - radius), min(n - 1, ix[0] + radius) + 1)
    ys = np.arange(max(0, iy[0] - radius), min(n - 1, iy[0] + radius) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return encode_xy(gx.ravel(), gy.ravel(), int(res[0]))


def cover_bbox(lon0: float, lat0: float, lon1: float, lat1: float, res: int) -> np.ndarray:
    """All cells intersecting the bbox — the coarse spatial-join key set
    (SURVEY.md E6 step 1)."""
    ix0, iy0 = grid_coords(np.array([lon0]), np.array([lat0]), res)
    ix1, iy1 = grid_coords(np.array([lon1]), np.array([lat1]), res)
    xs = np.arange(min(ix0[0], ix1[0]), max(ix0[0], ix1[0]) + 1)
    ys = np.arange(min(iy0[0], iy1[0]), max(iy0[0], iy1[0]) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return encode_xy(gx.ravel(), gy.ravel(), res)


# ------------------------------------------------------------- SQL / Column

def _spread_sql(x: str) -> str:
    for s, m in zip(_SHIFTS, _MASKS):
        x = f"((({x}) | (({x}) * {1 << s})) & {m})"
    return x


def cell_encode_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """One SQL expression computing the same int64 cell id, valid in both
    Spark SQL and DuckDB (only CAST/FLOOR/LEAST/GREATEST/&/|/*)."""
    n = 1 << res
    ix = f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1})"
    morton = f"({_spread_sql(ix)} | ({_spread_sql(iy)} * 2))"
    return f"(({morton}) * 32 + {res})"


def cell_expr(lon: Column, lat: Column, res: int) -> Column:
    """pyspark Column form (whole-stage-codegen friendly)."""
    n = 1 << res
    ix = F.least(F.greatest(F.floor((lon + 180.0) / 360.0 * n).cast("long"), F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)), F.lit(n - 1))

    def spread(c: Column) -> Column:
        for s, m in zip(_SHIFTS, _MASKS):
            c = c.bitwiseOR(F.shiftleft(c, s)).bitwiseAND(F.lit(m))
        return c

    morton = spread(ix).bitwiseOR(spread(iy) * 2)
    return F.shiftleft(morton, 5).bitwiseOR(F.lit(res))
