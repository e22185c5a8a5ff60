"""Downstream terrain analytics: what a dsm2dtm user computes NEXT.

The reference pipeline stops at the DTM raster (reference core.py:207-251);
its users' immediate downstream products are (a) terrain derivatives —
slope / hillshade — from the elevation grid, (b) the normalized DSM
(nDSM = DSM − DTM, height above ground: building/canopy heights), (c)
multi-resolution overviews (the GDAL-overview pyramid that makes a
10^12-image corpus browsable), and (d) lattice composites (mosaic rollups
of many rasters onto one shared grid). This module provides each as a
Spark-first operator: ONE mapInPandas decode pass per image emitting
narrow rows or per-(image, cell) partial aggregates, all combination
JVM-side (map-side combine shape — at 100 TB only small partials shuffle,
never pixels).

Arithmetic contract (CLAUDE.md): every derived quantity uses IEEE
mul/add/div/sqrt only — no libm — in the exact association the SQL
oracles use, so DuckDB replays gradients, block means and lattice indices
bit-for-bit from the materialized pixel fixture; only the final emitted
doubles are rounded (HALF_UP on both sides).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dsm2dtm_spark import codecs, golden
from dsm2dtm_spark.operators.zonal import pixel_center_lonlat
from dsm2dtm_spark.params import DEFAULT_RADIUS_M, NODATA_DEFAULT

# unit light vector for hillshade with EXACTLY representable components
# (0.48² + 0.36² + 0.8² = 1): azimuth/altitude angles would need libm
DEFAULT_LIGHT = (0.48, 0.36, 0.8)


def _ensure_parallelism(images: DataFrame, mult: int) -> DataFrame:
    """Low-partition inputs (one fat parquet file) would serialize the
    decode UDF behind a few tasks; compute is far heavier per byte than
    the scan, so repartitioning encoded bytes up is nearly free."""
    want = mult * images.sparkSession.sparkContext.defaultParallelism
    if images.rdd.getNumPartitions() < want:
        images = images.repartition(want)
    return images


# ------------------------------------------------------------ slope / shade

SLOPE_SHADE_SCHEMA = (
    "image_id string, n_px long, n_flat long, n_steep long, "
    "max_slope double, mean_slope double, mean_shade double, min_shade double"
)


def slope_shade_stats(
    images: DataFrame,
    light: tuple[float, float, float] = DEFAULT_LIGHT,
    flat_max: float = 0.02,
    steep_min: float = 0.5,
    value_round: int = 4,
) -> DataFrame:
    """Per-image slope / hillshade statistics from central differences.

    At each interior pixel whose 4-neighbours are all valid:
        gx = (E − W) / (2·xres_m)        (rise/run, dimensionless slope)
        gy = (S − N) / (2·yres_m)        (pixel-space: +y points south)
        slope = sqrt(gx² + gy²)
        shade = (lz − lx·gx − ly·gy) / sqrt(1 + gx² + gy²)
    ``shade`` is the cosine between the surface normal (−gx, −gy, 1)/‖·‖
    and the given unit light vector — the standard hillshade without any
    trig call, so the SQL oracle reproduces it exactly. ``n_flat`` /
    ``n_steep`` count slope ≤ flat_max / ≥ steep_min: because slope bits
    match the oracle's exactly, these counts are exact (no rounding).
    Images with no qualifying interior pixel produce no row.
    """
    lx, ly, lz = (float(v) for v in light)
    meta = _ensure_parallelism(
        images.select("image_id", "bytes", "w", "h", "fmt", "xres_m", "yres_m"), 2
    )
    cols = ["image_id", "n_px", "n_flat", "n_steep",
            "max_slope", "mean_slope", "mean_shade", "min_shade"]

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                g = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                if g.shape[0] < 3 or g.shape[1] < 3:
                    continue
                v = g != NODATA_DEFAULT
                m = v[1:-1, 1:-1] & v[1:-1, 2:] & v[1:-1, :-2] & v[2:, 1:-1] & v[:-2, 1:-1]
                if not m.any():
                    continue
                g64 = g.astype(np.float64)
                gx = ((g64[1:-1, 2:] - g64[1:-1, :-2]) / (2.0 * float(row.xres_m)))[m]
                gy = ((g64[2:, 1:-1] - g64[:-2, 1:-1]) / (2.0 * float(row.yres_m)))[m]
                slope = np.sqrt(gx * gx + gy * gy)
                shade = (lz - lx * gx - ly * gy) / np.sqrt(1.0 + gx * gx + gy * gy)
                rows.append(
                    {
                        "image_id": row.image_id,
                        "n_px": int(slope.size),
                        "n_flat": int(np.sum(slope <= flat_max)),
                        "n_steep": int(np.sum(slope >= steep_min)),
                        "max_slope": float(slope.max()),
                        "mean_slope": float(slope.mean()),
                        "mean_shade": float(shade.mean()),
                        "min_shade": float(shade.min()),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    out = meta.mapInPandas(stats, SLOPE_SHADE_SCHEMA)
    r = value_round
    return out.select(
        "image_id", "n_px", "n_flat", "n_steep",
        F.round("max_slope", r).alias("max_slope"),
        F.round("mean_slope", r).alias("mean_slope"),
        F.round("mean_shade", r).alias("mean_shade"),
        F.round("min_shade", r).alias("min_shade"),
    )


# ------------------------------------------------------------------- nDSM

NDSM_SCHEMA = "image_id string, n_px long, n_above long, max_ndsm double, mean_ndsm double"


def ndsm_numpy(dsm: np.ndarray, dtm: np.ndarray, above_m: float) -> dict | None:
    """Single-image nDSM statistics — shared by the distributed operator
    and the golden fixture generator so the two are bit-identical by
    construction (same numpy ops in the same order)."""
    m = (dsm != NODATA_DEFAULT) & (dtm != NODATA_DEFAULT)
    if not m.any():
        return None
    nd = dsm.astype(np.float64)[m] - dtm.astype(np.float64)[m]
    return {
        "n_px": int(nd.size),
        "n_above": int(np.sum(nd > above_m)),
        "max_ndsm": float(nd.max()),
        "mean_ndsm": float(nd.mean()),
    }


def ndsm_stats(
    images: DataFrame,
    radius_m: float = DEFAULT_RADIUS_M,
    above_m: float = 1.0,
    value_round: int = 4,
) -> DataFrame:
    """Normalized DSM (height above ground): run the full DSM→DTM pipeline
    per image, subtract, and aggregate — n_above counts pixels more than
    ``above_m`` above the derived terrain (the building/canopy detector a
    dsm2dtm user builds first). Golden-parity: the oracle is a committed
    fixture generated by the SAME ``ndsm_numpy`` over the golden clone."""
    golden.validate_job_params(radius_m, None)
    meta = _ensure_parallelism(
        images.select("image_id", "bytes", "w", "h", "fmt", "xres_m", "yres_m"), 3
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                g = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                dtm = golden.dsm_to_dtm(
                    g, (float(row.xres_m), float(row.yres_m)), radius_m=radius_m
                )
                s = ndsm_numpy(g, dtm, above_m)
                if s is not None:
                    rows.append({"image_id": row.image_id, **s})
            yield pd.DataFrame(
                rows, columns=["image_id", "n_px", "n_above", "max_ndsm", "mean_ndsm"]
            )

    out = meta.mapInPandas(stats, NDSM_SCHEMA)
    return out.select(
        "image_id", "n_px", "n_above",
        F.round("max_ndsm", value_round).alias("max_ndsm"),
        F.round("mean_ndsm", value_round).alias("mean_ndsm"),
    )


# -------------------------------------------------------- overview pyramid

OVERVIEW_SCHEMA = "image_id string, level int, py int, px int, n_src long, value double"


def overview_levels_numpy(
    grid: np.ndarray, levels: int
) -> list[tuple[int, np.ndarray, np.ndarray]]:
    """[(level, counts, values)] of 2×2 block-mean downsamples. Values stay
    full-precision doubles between levels (level k+1 averages level k's
    UNROUNDED means, exactly like the oracle's CTE chain). The block sum is
    associated in row-major scan order — t00 + t01 + t10 + t11 with invalid
    members contributing +0.0 (an exact IEEE identity) — which is the same
    order DuckDB's group SUM sees the fixture rows in."""
    val = grid.astype(np.float64)
    valid = grid != NODATA_DEFAULT
    out = []
    for level in range(1, levels + 1):
        h, w = val.shape
        if h % 2 or w % 2:
            val = np.pad(val, ((0, h % 2), (0, w % 2)))
            valid = np.pad(valid, ((0, h % 2), (0, w % 2)))
        t = np.where(valid, val, 0.0)
        s = t[0::2, 0::2] + t[0::2, 1::2] + t[1::2, 0::2] + t[1::2, 1::2]
        cnt = (
            valid[0::2, 0::2].astype(np.int64)
            + valid[0::2, 1::2]
            + valid[1::2, 0::2]
            + valid[1::2, 1::2]
        )
        value = np.divide(s, cnt, out=np.zeros_like(s), where=cnt > 0)
        out.append((level, cnt, value))
        val, valid = value, cnt > 0
        if not valid.any():
            break
    return out


def build_overviews(images: DataFrame, levels: int = 2, value_round: int = 4) -> DataFrame:
    """Multi-resolution overview pyramid (GDAL-overview semantics): level k
    cell (py, px) is the mean of its valid level k−1 2×2 block; blocks with
    zero valid members are nodata (no row). One decode pass emits every
    level's cells; at 100 TB the emitted pyramid is ≤ ⅓ of the base pixel
    count and writes straight to a partitioned sink — no shuffle at all."""
    meta = _ensure_parallelism(
        images.select("image_id", "bytes", "w", "h", "fmt"), 2
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                g = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                for level, cnt, value in overview_levels_numpy(g, levels):
                    yy, xx = np.nonzero(cnt)
                    if not yy.size:
                        continue
                    frames.append(
                        pd.DataFrame(
                            {
                                "image_id": row.image_id,
                                "level": np.full(yy.size, level, dtype=np.int32),
                                "py": yy.astype(np.int32),
                                "px": xx.astype(np.int32),
                                "n_src": cnt[yy, xx],
                                "value": value[yy, xx],
                            }
                        )
                    )
            cols = ["image_id", "level", "py", "px", "n_src", "value"]
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=cols)

    out = meta.mapInPandas(build, OVERVIEW_SCHEMA)
    return out.select(
        "image_id", "level", "py", "px", "n_src",
        F.round("value", value_round).alias("value"),
    )


# ------------------------------------------------------- lattice composite

COMPOSITE_PARTIAL_SCHEMA = (
    "image_id string, cy long, cx long, n_px long, sum_val double, max_val double"
)


def grid_composite(images: DataFrame, cell_deg: float = 0.05, value_round: int = 4) -> DataFrame:
    """Mosaic rollup: every raster's valid pixels land on one shared
    lon/lat lattice (cell = floor(coord / cell_deg), the same IEEE division
    on both engines) and each lattice cell aggregates across ALL images —
    n_px / n_img / max_val / mean_val per cell.

    Scale shape: the decode UDF emits per-(image, cell) PARTIAL aggregates
    (map-side combine — an image contributes a handful of rows, never its
    pixels), then a JVM groupBy(cy, cx) combines partials; the shuffle
    volume is O(images·cells-per-image), independent of pixel count."""
    cell = float(cell_deg)
    meta = _ensure_parallelism(
        images.select("image_id", "bytes", "w", "h", "fmt", "lon0", "lat0", "xres_m", "yres_m"), 2
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                g = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                yy, xx = np.nonzero(g != NODATA_DEFAULT)
                if not yy.size:
                    continue
                lons, lats = pixel_center_lonlat(
                    float(row.lon0), float(row.lat0),
                    float(row.xres_m), float(row.yres_m), int(row.h), int(row.w),
                )
                cx = np.floor(lons[xx] / cell).astype(np.int64)
                cy = np.floor(lats[yy] / cell).astype(np.int64)
                vals = g[yy, xx].astype(np.float64)
                keys, inv = np.unique(np.stack([cy, cx], axis=1), axis=0, return_inverse=True)
                inv = inv.ravel()  # numpy 2.0 returns (n,1) with axis=, 2.1+ (n,)
                mx = np.full(len(keys), -np.inf)
                np.maximum.at(mx, inv, vals)
                frames.append(
                    pd.DataFrame(
                        {
                            "image_id": row.image_id,
                            "cy": keys[:, 0],
                            "cx": keys[:, 1],
                            "n_px": np.bincount(inv, minlength=len(keys)),
                            "sum_val": np.bincount(inv, weights=vals, minlength=len(keys)),
                            "max_val": mx,
                        }
                    )
                )
            cols = ["image_id", "cy", "cx", "n_px", "sum_val", "max_val"]
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=cols)

    part = meta.mapInPandas(partials, COMPOSITE_PARTIAL_SCHEMA)
    r = value_round
    return part.groupBy("cy", "cx").agg(
        F.sum("n_px").alias("n_px"),
        F.countDistinct("image_id").alias("n_img"),
        F.round(F.max("max_val"), r).alias("max_val"),
        F.round(F.sum("sum_val") / F.sum("n_px"), r).alias("mean_val"),
    )
