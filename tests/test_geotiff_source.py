"""Optional GeoTIFF source (sources.geotiff): the import-guard contract runs
everywhere; the rasterio-backed ingest itself is skip-marked (rasterio is
absent in this sandbox — SURVEY.md §7.0) and documents the swap-in path."""

from __future__ import annotations

import numpy as np
import pytest

from dsm2dtm_spark.sources import geotiff


class TestImportGuard:
    def test_module_imports_without_rasterio(self):
        # the guard itself: importing the module never requires rasterio
        assert geotiff.HAS_RASTERIO in (True, False)

    @pytest.mark.skipif(geotiff.HAS_RASTERIO, reason="rasterio present — guard inactive")
    def test_clear_error_when_rasterio_missing(self, spark):
        with pytest.raises(ImportError, match="rasterio is not installed"):
            geotiff.read_geotiff_table(spark, ["/nonexistent.tif"])


@pytest.mark.skipif(not geotiff.HAS_RASTERIO, reason="rasterio not installed in this environment")
class TestGeoTiffIngest:
    """Runs only where rasterio exists; asserts the adapter feeds the DTM
    plan unchanged (the documented swap-in path)."""

    def test_roundtrip_and_dtm(self, spark, tmp_path):
        import rasterio
        from rasterio.transform import from_origin

        from dsm2dtm_spark import codecs, golden
        from dsm2dtm_spark.plans import dtm_transform

        grid = np.full((60, 60), 100.0, dtype=np.float32)
        grid[20:32, 20:32] += 15.0
        path = str(tmp_path / "dsm.tif")
        with rasterio.open(
            path,
            "w",
            driver="GTiff",
            height=60,
            width=60,
            count=1,
            dtype="float32",
            crs="EPSG:32631",
            transform=from_origin(500000, 4000000, 1.0, 1.0),
            nodata=-99999.0,
        ) as dst:
            dst.write(grid, 1)

        images = geotiff.read_geotiff_table(spark, [path])
        row = images.collect()[0]
        assert (row.w, row.h, row.fmt) == (60, 60, "raw_f32")
        np.testing.assert_array_equal(codecs.decode(bytes(row.bytes), 60, 60, "raw_f32"), grid)
        out = dtm_transform(images).collect()[0]
        want = golden.dsm_to_dtm(grid, (1.0, 1.0))
        np.testing.assert_array_equal(codecs.decode(bytes(out.bytes), 60, 60, "raw_f32"), want)
