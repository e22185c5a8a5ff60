"""Geo scalar functions (SURVEY.md R2, R4, R26, R27, E14) — pyspark Column
forms, each with an obvious SQL twin for oracle checks."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def utm_epsg(lon: Column, lat: Column) -> Column:
    """UTM EPSG from lon/lat — the reference's zone-math fallback
    (utm_utils.py:42-45), including the lon=180 wrap."""
    zone = (F.floor((lon + 180.0) / 6.0) % 60 + 1).cast("long")
    return (F.when(lat < 0, 32700).otherwise(32600) + zone).alias("epsg")


def validate_crs(crs: Column) -> Column:
    """Hard-fail rows without a CRS (reference core.py:60-61): units cannot
    be inferred. Use inside select(): raises at execution on violation."""
    return F.when(crs.isNull(), F.raise_error(F.lit("raster has no CRS — assign one before processing"))).otherwise(
        crs
    )


def coalesce_nodata(nodata: Column, default: float = -99999.0) -> Column:
    """Nodata defaulting (reference core.py:63)."""
    return F.coalesce(nodata, F.lit(default))


def writer_safe_nodata(nodata: Column) -> Column:
    """Non-finite nodata → −9999.0 for writers (reference plugin
    processing_algorithm.py:27-29)."""
    return F.when(F.isnan(nodata) | (F.abs(nodata) == float("inf")), F.lit(-9999.0)).otherwise(nodata)


def rotation_aware_pixel_size(gt1: Column, gt2: Column) -> Column:
    """px = sqrt(gt1² + gt2²) from a GDAL geotransform (reference plugin
    processing_algorithm.py:211-215) — correct for rotated rasters."""
    return F.sqrt(gt1 * gt1 + gt2 * gt2)


def cell_size(xres: Column, yres: Column) -> Column:
    """Collapsed scalar cell size (reference algorithm.py:476-478)."""
    return F.greatest((F.abs(xres) + F.abs(yres)) / 2.0, F.lit(0.001))
