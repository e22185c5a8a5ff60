"""Warp kernel + geo scalar function tests (SURVEY.md R2/R4/R5/R21/R26/R27)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dsm2dtm_spark.functions import geo
from dsm2dtm_spark.kernels.warp import Affine, warp_bilinear

NODATA = -9999.0


class TestAffine:
    def test_from_origin_and_inverse(self):
        t = Affine.from_origin(500000, 4000000, 2.0, 2.0)
        x, y = t.apply(np.array([0.5]), np.array([0.5]))  # center of pixel (0,0)
        assert x[0] == 500001.0 and y[0] == 3999999.0
        inv = t.inverse()
        c, r = inv.apply(x, y)
        assert c[0] == pytest.approx(0.5) and r[0] == pytest.approx(0.5)


class TestWarp:
    def test_identity_warp_is_exact(self):
        rng = np.random.default_rng(0)
        src = rng.normal(100, 5, (20, 30)).astype(np.float32)
        t = Affine.from_origin(0, 20, 1.0, 1.0)
        out = warp_bilinear(src, t, t, (20, 30), NODATA)
        np.testing.assert_allclose(out, src, rtol=1e-6)

    def test_shift_by_whole_pixels(self):
        src = np.arange(100, dtype=np.float32).reshape(10, 10)
        t_src = Affine.from_origin(0, 10, 1.0, 1.0)
        t_dst = Affine.from_origin(2, 8, 1.0, 1.0)  # 2 px east, 2 px south
        out = warp_bilinear(src, t_src, t_dst, (10, 10), NODATA)
        np.testing.assert_allclose(out[:8, :8], src[2:, 2:], rtol=1e-6)
        assert (out[8:, :] == NODATA).all() and (out[:, 8:] == NODATA).all()

    def test_downscale_round_trip_preserves_smooth_field(self):
        yy, xx = np.mgrid[0:40, 0:40]
        src = (100 + 0.5 * yy + 0.25 * xx).astype(np.float32)
        t_src = Affine.from_origin(0, 40, 1.0, 1.0)
        t_coarse = Affine.from_origin(0, 40, 2.0, 2.0)
        coarse = warp_bilinear(src, t_src, t_coarse, (20, 20), NODATA)
        back = warp_bilinear(coarse, t_coarse, t_src, (40, 40), NODATA)
        inner = (slice(4, 36), slice(4, 36))
        np.testing.assert_allclose(back[inner], src[inner], atol=0.01)

    def test_nodata_never_smears(self):
        src = np.full((12, 12), 50.0, dtype=np.float32)
        src[4:8, 4:8] = NODATA
        t = Affine.from_origin(0, 12, 1.0, 1.0)
        t2 = Affine.from_origin(0.25, 11.75, 1.0, 1.0)  # sub-pixel shift
        out = warp_bilinear(src, t, t2, (12, 12), NODATA)
        valid = out != NODATA
        assert np.abs(out[valid] - 50.0).max() < 1e-4  # no half-nodata values
        assert (out == NODATA).sum() >= 9  # hole survives

    def test_coordinate_converter_hook(self):
        # lon/lat source sampled onto a meters grid via an equirect converter
        src = np.tile(np.arange(10, dtype=np.float32), (10, 1))
        t_geo = Affine.from_origin(0.0, 10 * 0.001, 0.001, 0.001)  # degrees
        m_per_deg = 100000.0
        t_m = Affine.from_origin(0.0, 10 * 0.001 * m_per_deg, 0.001 * m_per_deg, 0.001 * m_per_deg)
        out = warp_bilinear(
            src, t_geo, t_m, (10, 10), NODATA, coord_inv=lambda x, y: (x / m_per_deg, y / m_per_deg)
        )
        np.testing.assert_allclose(out, src, rtol=1e-5, atol=1e-5)


class TestGeoColumns:
    def test_utm_and_nodata_functions(self, spark):
        # tuples, not pandas: the Arrow conversion folds NaN into NULL, and
        # this test needs a genuine NaN to reach writer_safe_nodata
        rows_in = [
            (0.5, 51.0, None, 1.0, 0.0),
            (-74.0, 40.7, float("nan"), 3.0, 4.0),
            (151.2, -33.8, -99999.0, 0.5, 0.0),
            (180.0, 0.0, float("inf"), 2.0, 0.0),
        ]
        df = spark.createDataFrame(rows_in, "lon double, lat double, nodata double, gt1 double, gt2 double")
        rows = df.select(
            geo.utm_epsg(F.col("lon"), F.col("lat")).alias("epsg"),
            geo.coalesce_nodata(F.col("nodata")).alias("nd"),
            geo.writer_safe_nodata(F.col("nodata")).alias("wnd"),
            geo.rotation_aware_pixel_size(F.col("gt1"), F.col("gt2")).alias("px"),
        ).collect()
        assert [r.epsg for r in rows] == [32631, 32618, 32756, 32601]
        assert rows[0].nd == -99999.0
        assert rows[1].wnd == -9999.0 and rows[3].wnd == -9999.0
        assert rows[1].px == 5.0

    def test_validate_crs_raises(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"crs": [32631, None]}).astype({"crs": "Int64"}))
        with pytest.raises(Exception, match="no CRS"):
            df.select(geo.validate_crs(F.col("crs"))).collect()
