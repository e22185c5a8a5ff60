"""Zonal statistics (vector footprints × raster pixels): Spark result vs a
brute-force numpy reference over every (footprint, image) pair, for rect AND
polygon zones; plus the plan property (cell-cover broadcast equi-join, no
cartesian)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark import codecs, synth
from dsm2dtm_spark.operators import zonal
from dsm2dtm_spark.operators.spatial import points_in_polygon
from dsm2dtm_spark.params import NODATA_DEFAULT


@pytest.fixture(scope="module")
def data(spark):
    images = synth.image_table(12, seed=77, sizes=(40, 64), dup_fraction=0.0).drop(columns=["scenario"])
    fps = synth.footprint_table(30, seed=78)
    return images, fps, spark.createDataFrame(images), spark.createDataFrame(fps)


def brute_force(images: pd.DataFrame, fps: pd.DataFrame) -> dict:
    want = {}
    for im in images.itertuples(index=False):
        grid = codecs.decode(im.bytes, int(im.h), int(im.w), im.fmt)
        lons, lats = zonal.pixel_center_lonlat(
            im.lon0, im.lat0, im.xres_m, im.yres_m, int(im.h), int(im.w)
        )
        for fp in fps.itertuples(index=False):
            if fp.kind == "rect":
                mask = ((lats >= fp.y0) & (lats <= fp.y1))[:, None] & (
                    (lons >= fp.x0) & (lons <= fp.x1)
                )[None, :]
            else:
                gx, gy = np.meshgrid(lons, lats)
                mask = points_in_polygon(
                    np.asarray(fp.xs), np.asarray(fp.ys), gx.ravel(), gy.ravel()
                ).reshape(grid.shape)
            mask &= grid != NODATA_DEFAULT
            if mask.any():
                v = grid[mask].astype(np.float64)
                want[(fp.footprint_id, im.image_id)] = (
                    int(v.size),
                    round(float(v.mean()), 4),
                    round(float(v.min()), 4),
                    round(float(v.max()), 4),
                )
    return want


class TestZonalStats:
    def test_matches_brute_force_all_kinds(self, spark, data):
        images, fps, simg, sfp = data
        got = {
            (r.footprint_id, r.image_id): (r.n_px, r.mean_val, r.min_val, r.max_val)
            for r in zonal.zonal_stats(simg, sfp).collect()
        }
        want = brute_force(images, fps)
        assert set(got) == set(want)
        assert len(want) > 0  # the fixture genuinely overlaps
        for k in want:
            assert got[k][0] == want[k][0], k
            for gi, wi in zip(got[k][1:], want[k][1:]):
                assert gi == pytest.approx(wi, abs=1e-4), k

    def test_nodata_pixels_excluded(self, spark):
        # an image half-covered by nodata inside a rect that contains it all
        g = np.full((10, 10), 7.0, dtype=np.float32)
        g[:, 5:] = NODATA_DEFAULT
        img = pd.DataFrame(
            [{
                "image_id": "z0", "bytes": codecs.encode_raw_f32(g), "w": 10, "h": 10,
                "fmt": "raw_f32", "lon0": 10.0, "lat0": 20.0, "xres_m": 2.0, "yres_m": 2.0,
            }]
        )
        fp = pd.DataFrame(
            [{
                "footprint_id": "f0", "kind": "rect",
                "xs": [9.0, 11.0, 11.0, 9.0], "ys": [19.0, 19.0, 21.0, 21.0],
                "x0": 9.0, "y0": 19.0, "x1": 11.0, "y1": 21.0,
            }]
        )
        out = zonal.zonal_stats(spark.createDataFrame(img), spark.createDataFrame(fp)).collect()
        assert len(out) == 1
        assert out[0].n_px == 50 and out[0].mean_val == 7.0

    def test_point_sample_matches_direct_indexing(self, spark, data):
        images, _, simg, _ = data
        # points at fixed fractions inside each image + guaranteed misses
        pts, want = [], {}
        qid = 0
        for im in images.itertuples(index=False):
            grid = codecs.decode(im.bytes, int(im.h), int(im.w), im.fmt)
            scale = 111320.0 * (1.0 - 1.523e-4 * im.lat0 * im.lat0)
            for fx, fy in ((0.3, 0.7), (0.9, 0.1)):
                x = im.lon0 + (fx * im.w * im.xres_m) / scale
                y = im.lat0 - (fy * im.h * im.yres_m) / 110540.0
                px = int(np.floor((x - im.lon0) * scale / im.xres_m))
                py = int(np.floor((im.lat0 - y) * 110540.0 / im.yres_m))
                v = float(grid[py, px])
                if v != NODATA_DEFAULT:
                    want[qid] = (im.image_id, py, px, round(v, 4))
                pts.append({"query_id": qid, "x": x, "y": y})
                qid += 1
        pts.append({"query_id": qid, "x": 0.0, "y": 85.0})  # miss
        spts = spark.createDataFrame(pd.DataFrame(pts))
        got = {r.query_id: (r.image_id, r.py, r.px, r.value)
               for r in zonal.point_sample(simg, spts).collect()}
        assert got == want
        assert qid not in got  # the miss produced no row

    def test_point_in_outer_half_pixel_margin_across_cell_boundary(self, spark):
        # regression (review find): the candidate cover used the pixel-CENTER
        # bbox, so a point in the outer half-pixel margin whose CELL differs
        # from every pixel-center cell was silently dropped. Build exactly
        # that geometry: image anchored a quarter-pixel left of a res-8 cell
        # boundary, query point between the anchor and the boundary.
        from dsm2dtm_spark.operators import cellindex

        B = -180.0 + 130 * (360.0 / 256.0)  # a res-8 lon cell boundary
        lat0 = 10.0
        xres = 1000.0  # ~0.009° pixels at this latitude
        lon0 = B - 0.002  # anchor < boundary < first pixel center
        x = B - 0.001
        g = np.full((8, 8), 42.0, dtype=np.float32)
        img = pd.DataFrame(
            [{
                "image_id": "edge", "bytes": codecs.encode_raw_f32(g), "w": 8, "h": 8,
                "fmt": "raw_f32", "lon0": lon0, "lat0": lat0, "xres_m": xres, "yres_m": xres,
            }]
        )
        pts = pd.DataFrame([{"query_id": 0, "x": x, "y": lat0 - 0.001}])
        # sanity: the point's cell really differs from the first pixel center's
        lons, lats = zonal.pixel_center_lonlat(lon0, lat0, xres, xres, 8, 8)
        c_pt = cellindex.encode_cells(np.array([x]), np.array([lat0 - 0.001]), 8)[0]
        c_px = cellindex.encode_cells(np.array([lons[0]]), np.array([lats[0]]), 8)[0]
        assert c_pt != c_px, "fixture no longer exercises the margin geometry"
        out = zonal.point_sample(spark.createDataFrame(img), spark.createDataFrame(pts)).collect()
        assert len(out) == 1 and out[0].value == 42.0 and (out[0].py, out[0].px) == (0, 0)

    def test_plan_is_broadcast_equi_join(self, spark, data):
        _, _, simg, sfp = data
        plan = zonal.zonal_stats(simg, sfp)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan
        assert "BroadcastHashJoin" in plan
