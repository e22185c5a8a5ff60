"""Optional rasterio-backed GeoTIFF source behind an import guard.

The engine replaces the reference's rasterio/GDAL file I/O (reference
core.py:56-74, 126-136) with in-row codecs over parquet by design (SURVEY.md
§7.3) — rasterio does not exist in this sandbox. This adapter closes the
"point the engine at real GeoTIFFs" seam as a CONFIG change instead of a
code change: when rasterio is importable, ``read_geotiff_table`` turns a
list of .tif paths into the engine's canonical image+caption DataFrame
(input_hint schema + geo anchors), after which ``plans.dtm_transform`` /
``tiled_dtm_transform`` run unchanged.

Scale shape: paths are distributed as a one-column DataFrame and each file
is opened INSIDE a mapInPandas stage (rasterio on the executors, reading
from a shared filesystem or object store), so ingest parallelizes across the
cluster — the driver never touches pixel data. Mirrors the reference's load
semantics: band 1 as float32 (core.py:68, 86), nodata defaulting to −99999.0
(core.py:63), CRS hard-fail when missing (core.py:60-61), rotation-aware
pixel size from the geotransform (qgis plugin processing_algorithm.py:211-215).
Geographic (degree-unit) rasters are flagged via ``is_geographic`` so the
caller can route them through the warp kernel (kernels.warp, reference
core.py:83-98) before processing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from dsm2dtm_spark.params import NODATA_DEFAULT

try:
    import rasterio  # noqa: F401

    HAS_RASTERIO = True
except ImportError:  # sandbox: no rasterio, no network to install it
    HAS_RASTERIO = False

GEOTIFF_ROW_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, lon0 double, lat0 double, xres_m double, yres_m double, "
    "crs int, is_geographic boolean"
)


def _require_rasterio() -> None:
    if not HAS_RASTERIO:
        raise ImportError(
            "rasterio is not installed — the GeoTIFF source is an optional "
            "adapter; install rasterio (and GDAL) to ingest .tif files, or "
            "write the image table as parquet with the engine codecs instead"
        )


def read_geotiff_table(spark, paths: list[str], parallelism: int | None = None, reader: str = "auto"):
    """list of GeoTIFF paths → the engine's image+caption DataFrame.

    ``reader='rasterio'`` opens files with rasterio on the executors (full
    GDAL format coverage: compressed/tiled/rotated rasters). ``'builtin'``
    uses the engine's zero-dependency TIFF reader (sources.tiffio —
    uncompressed strips, GeoTIFF keys), which covers the reference's own
    output format. ``'auto'`` (default) picks rasterio when importable,
    else the builtin — so the GeoTIFF surface works in every environment.

    Each executor task opens its files and emits one row per raster in the
    canonical schema (grid re-encoded as the lossless raw_f32 codec;
    caption = the file path for provenance)."""
    if reader == "builtin" or (reader == "auto" and not HAS_RASTERIO):
        from dsm2dtm_spark.sources import tiffio

        return tiffio.read_geotiff_table(spark, paths, parallelism)
    _require_rasterio()
    from pyspark.sql import functions as F

    from dsm2dtm_spark import codecs

    def load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import rasterio as rio  # import on the executor

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                with rio.open(path) as src:
                    if src.crs is None:  # reference core.py:60-61
                        raise ValueError(f"{path}: dataset has no CRS")
                    grid = src.read(1).astype(np.float32)
                    nodata = src.nodata if src.nodata is not None else NODATA_DEFAULT
                    # normalize the sentinel; NaN nodata (the common float-
                    # raster convention) never matches with ==, so mask it
                    # explicitly — and stray NaNs are nodata either way
                    mask = np.isnan(grid) if np.isnan(nodata) else (grid == nodata) | np.isnan(grid)
                    grid = np.where(mask, np.float32(NODATA_DEFAULT), grid)
                    t = src.transform
                    xres = float(np.hypot(t.a, t.b))  # rotation-aware (R26)
                    yres = float(np.hypot(t.d, t.e))
                    lon0, lat0 = t * (0, 0)
                    epsg = src.crs.to_epsg() or 0
                    rows.append(
                        {
                            "image_id": path,
                            "bytes": codecs.encode_raw_f32(grid),
                            "w": int(src.width),
                            "h": int(src.height),
                            "fmt": "raw_f32",
                            "caption": path,
                            "phash": codecs.ahash64(grid),
                            "lon0": float(lon0),
                            "lat0": float(lat0),
                            "xres_m": xres,
                            "yres_m": yres,
                            "crs": int(epsg),
                            "is_geographic": bool(src.crs.is_geographic),
                        }
                    )
            yield pd.DataFrame(rows)

    if parallelism is None:
        parallelism = min(len(paths), spark.sparkContext.defaultParallelism) or 1
    pdf = pd.DataFrame({"path": paths})
    return (
        spark.createDataFrame(pdf)
        .repartition(parallelism, F.col("path"))
        .mapInPandas(load, GEOTIFF_ROW_SCHEMA)
    )


def read_geotiff_objects(spark, items, parallelism: int | None = None, reader: str = "auto"):
    """Path-or-open-object ingest — the engine twin of the reference's
    ``_load_dsm(Union[str, DatasetReader])`` surface (core.py:126-136,
    test_core.py:189-198). Items may be paths, raw TIFF bytes, open binary
    handles, or ``(image_id, array, profile)`` tuples. Paths go through the
    ``reader`` dispatch (rasterio when available, builtin otherwise); the
    in-memory objects always use the builtin codec (an open handle's bytes
    are driver-resident by definition — see tiffio.read_geotiff_objects for
    the serialization story)."""
    import os

    from dsm2dtm_spark.sources import tiffio

    items = list(items)  # a generator would be exhausted by the first pass
    paths = [os.fspath(i) for i in items if isinstance(i, (str, os.PathLike))]
    objects = [i for i in items if not isinstance(i, (str, os.PathLike))]
    parts = []
    if paths:
        parts.append(read_geotiff_table(spark, paths, parallelism, reader=reader))
    if objects:
        parts.append(tiffio.read_geotiff_objects(spark, objects, parallelism))
    if not parts:
        raise ValueError("read_geotiff_objects: no items")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
