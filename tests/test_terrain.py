"""Terrain analytics operators (operators/terrain.py): hand-computed slope/
hillshade, nDSM parity vs the golden clone, overview-pyramid block means,
and the lattice composite — the downstream products of the DTM pipeline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark import codecs, golden
from dsm2dtm_spark.operators import terrain
from dsm2dtm_spark.params import NODATA_DEFAULT


def _img(image_id, g, xres=1.0, yres=1.0, lon0=10.0, lat0=20.0):
    return {
        "image_id": image_id, "bytes": codecs.encode_raw_f32(g),
        "w": g.shape[1], "h": g.shape[0], "fmt": "raw_f32",
        "lon0": lon0, "lat0": lat0, "xres_m": xres, "yres_m": yres,
    }


class TestSlopeShade:
    def test_plane_gradient_exact(self, spark):
        # g = 100 + 2x + 3y with xres=2, yres=1 → gx = 4/(2·2) = 1, gy = 6/2 = 3
        yy, xx = np.mgrid[0:5, 0:5]
        g = (100.0 + 2.0 * xx + 3.0 * yy).astype(np.float32)
        out = terrain.slope_shade_stats(
            spark.createDataFrame(pd.DataFrame([_img("p", g, xres=2.0, yres=1.0)]))
        ).collect()
        assert len(out) == 1
        r = out[0]
        slope = np.sqrt(1.0 * 1.0 + 3.0 * 3.0)
        shade = (0.8 - 0.48 * 1.0 - 0.36 * 3.0) / np.sqrt(1.0 + 1.0 + 9.0)
        assert r.n_px == 9  # 3×3 interior of a 5×5 grid
        assert r.max_slope == pytest.approx(slope, abs=1e-4)
        assert r.mean_slope == pytest.approx(slope, abs=1e-4)
        assert r.mean_shade == pytest.approx(shade, abs=1e-4)
        assert r.n_flat == 0 and r.n_steep == 9

    def test_nodata_neighbourhood_excluded(self, spark):
        yy, xx = np.mgrid[0:5, 0:5]
        g = (100.0 + 2.0 * xx + 3.0 * yy).astype(np.float32)
        g[2, 2] = NODATA_DEFAULT  # kills the centre + its 4 interior neighbours
        out = terrain.slope_shade_stats(
            spark.createDataFrame(pd.DataFrame([_img("h", g)]))
        ).collect()
        assert out[0].n_px == 4

    def test_flat_grid_counts(self, spark):
        g = np.full((6, 6), 50.0, dtype=np.float32)
        r = terrain.slope_shade_stats(
            spark.createDataFrame(pd.DataFrame([_img("f", g)]))
        ).collect()[0]
        assert r.n_px == 16 and r.n_flat == 16 and r.n_steep == 0
        assert r.max_slope == 0.0 and r.mean_shade == 0.8  # shade = lz on flat

    def test_all_nodata_produces_no_row(self, spark):
        g = np.full((4, 4), NODATA_DEFAULT, dtype=np.float32)
        out = terrain.slope_shade_stats(
            spark.createDataFrame(pd.DataFrame([_img("n", g)]))
        ).collect()
        assert out == []


class TestNdsm:
    def test_building_heights_recovered(self, spark):
        # flat 100 m terrain with a 20 m building: nDSM ≈ 20 on the footprint
        g = np.full((50, 50), 100.0, dtype=np.float32)
        g[10:20, 10:20] += 20.0
        sdf = spark.createDataFrame(pd.DataFrame([_img("b", g)]))
        r = terrain.ndsm_stats(sdf, radius_m=10.0, above_m=1.0).collect()[0]
        assert r.n_above == pytest.approx(100, abs=30)  # ~the 10×10 footprint
        assert r.max_ndsm == pytest.approx(20.0, abs=1.0)

    def test_distributed_matches_single_node(self, spark):
        from dsm2dtm_spark import synth

        images = synth.image_table(n_rows=6, seed=99, sizes=(40, 52))
        sdf = spark.createDataFrame(images.drop(columns=["scenario"]))
        got = {
            r.image_id: (r.n_px, r.n_above, r.max_ndsm, r.mean_ndsm)
            for r in terrain.ndsm_stats(sdf, radius_m=30.0).collect()
        }
        want = {}
        for r in images.itertuples(index=False):
            grid = codecs.decode(r.bytes, int(r.h), int(r.w), r.fmt)
            dtm = golden.dsm_to_dtm(grid, (float(r.xres_m), float(r.yres_m)), radius_m=30.0)
            s = terrain.ndsm_numpy(grid, dtm, above_m=1.0)
            if s is not None:
                want[r.image_id] = (
                    s["n_px"], s["n_above"], round(s["max_ndsm"], 4), round(s["mean_ndsm"], 4)
                )
        assert set(got) == set(want)
        for k in want:
            assert got[k][:2] == want[k][:2], k
            assert got[k][2] == pytest.approx(want[k][2], abs=1e-4), k
            assert got[k][3] == pytest.approx(want[k][3], abs=1e-4), k


class TestOverviews:
    def test_hand_blocks_with_nodata_and_odd_dims(self, spark):
        g = np.array(
            [
                [1.0, 2.0, 3.0],
                [4.0, NODATA_DEFAULT, 6.0],
                [7.0, 8.0, 9.0],
            ],
            dtype=np.float32,
        )
        out = terrain.build_overviews(
            spark.createDataFrame(pd.DataFrame([_img("o", g)])), levels=2
        ).collect()
        l1 = {(r.py, r.px): (r.n_src, r.value) for r in out if r.level == 1}
        # blocks: (0,0)={1,2,4} mean 7/3; (0,1)={3,6} mean 4.5; (1,0)={7,8} 7.5; (1,1)={9}
        assert l1 == {
            (0, 0): (3, round(7.0 / 3.0, 4)),
            (0, 1): (2, 4.5),
            (1, 0): (2, 7.5),
            (1, 1): (1, 9.0),
        }
        l2 = [r for r in out if r.level == 2]
        # GDAL average resampling: level 2 = mean of the valid BASE pixels
        assert len(l2) == 1 and l2[0].n_src == 8
        assert l2[0].value == round((1 + 2 + 3 + 4 + 6 + 7 + 8 + 9) / 8.0, 4)

    def test_empty_block_produces_no_row(self, spark):
        g = np.full((4, 4), NODATA_DEFAULT, dtype=np.float32)
        g[0, 0] = 5.0
        out = terrain.build_overviews(
            spark.createDataFrame(pd.DataFrame([_img("e", g)])), levels=1
        ).collect()
        assert {(r.py, r.px, r.n_src, r.value) for r in out} == {(0, 0, 1, 5.0)}

    def test_distributed_matches_local_kernel(self, spark):
        from dsm2dtm_spark import synth

        images = synth.image_table(n_rows=5, seed=7, sizes=(33, 40))
        sdf = spark.createDataFrame(images.drop(columns=["scenario"]))
        got = {
            (r.image_id, r.level, r.py, r.px): (r.n_src, r.value)
            for r in terrain.build_overviews(sdf, levels=3).collect()
        }
        want = {}
        for r in images.itertuples(index=False):
            grid = codecs.decode(r.bytes, int(r.h), int(r.w), r.fmt)
            for level, cnt, value in terrain.overview_levels_numpy(grid, 3):
                for py, px in zip(*np.nonzero(cnt)):
                    want[(r.image_id, level, int(py), int(px))] = (
                        int(cnt[py, px]), round(float(value[py, px]), 4)
                    )
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], k
            assert got[k][1] == pytest.approx(want[k][1], abs=1e-4), k


class TestCurvature:
    def test_plane_is_flat(self, spark):
        yy, xx = np.mgrid[0:6, 0:6]
        g = (100.0 + 2.0 * xx + 3.0 * yy).astype(np.float32)  # linear → lap 0
        r = terrain.curvature_stats(
            spark.createDataFrame(pd.DataFrame([_img("p", g)]))
        ).collect()[0]
        assert r.n_px == 16 and r.n_convex == 0 and r.n_concave == 0
        assert r.max_lap == 0.0 and r.min_lap == 0.0

    def test_paraboloid_concave_exact(self, spark):
        # z = x² + y²: d²z/dx² = d²z/dy² = 2 → lap = 4/res² everywhere
        yy, xx = np.mgrid[0:7, 0:7]
        g = ((xx - 3.0) ** 2 + (yy - 3.0) ** 2).astype(np.float32)
        r = terrain.curvature_stats(
            spark.createDataFrame(pd.DataFrame([_img("b", g, xres=2.0, yres=2.0)]))
        ).collect()[0]
        assert r.n_px == 25 and r.n_concave == 25 and r.n_convex == 0
        assert r.mean_lap == pytest.approx(4.0 / 4.0, abs=1e-4)

    def test_dome_is_convex(self, spark):
        yy, xx = np.mgrid[0:7, 0:7]
        g = (200.0 - (xx - 3.0) ** 2 - (yy - 3.0) ** 2).astype(np.float32)
        r = terrain.curvature_stats(
            spark.createDataFrame(pd.DataFrame([_img("d", g)]))
        ).collect()[0]
        assert r.n_convex == r.n_px and r.n_concave == 0
        assert r.max_lap == -4.0


class TestElevationBands:
    def test_hand_bands(self, spark):
        g = np.array([[5.0, 15.0], [25.0, -3.0]], dtype=np.float32)
        g = np.pad(g, ((0, 2), (0, 2)), constant_values=NODATA_DEFAULT)
        out = {r.band: r.n_px for r in terrain.elevation_bands(
            spark.createDataFrame(pd.DataFrame([_img("b", g)])), band_m=10.0
        ).collect()}
        assert out == {0: 1, 1: 1, 2: 1, -1: 1}  # floor(-3/10) = -1

    def test_counts_partition_pixels(self, spark):
        from dsm2dtm_spark import synth

        images = synth.image_table(n_rows=4, seed=3, sizes=(30,))
        sdf = spark.createDataFrame(images.drop(columns=["scenario"]))
        per_img = {}
        for r in terrain.elevation_bands(sdf).collect():
            per_img[r.image_id] = per_img.get(r.image_id, 0) + r.n_px
        for r in images.itertuples(index=False):
            g = codecs.decode(r.bytes, int(r.h), int(r.w), r.fmt)
            want = int((g != NODATA_DEFAULT).sum())
            assert per_img.get(r.image_id, 0) == want

    def test_invalid_band_raises(self, spark):
        sdf = spark.createDataFrame(
            pd.DataFrame([_img("x", np.zeros((4, 4), dtype=np.float32))])
        )
        with pytest.raises(ValueError):
            terrain.elevation_bands(sdf, band_m=0.0)


class TestGridComposite:
    def test_overlapping_images_combine(self, spark):
        # two 4×4 images at the same anchor → same lattice cell(s)
        a = np.full((4, 4), 10.0, dtype=np.float32)
        b = np.full((4, 4), 30.0, dtype=np.float32)
        b[0, 0] = NODATA_DEFAULT
        sdf = spark.createDataFrame(
            pd.DataFrame([_img("a", a, lon0=10.0, lat0=20.0), _img("b", b, lon0=10.0, lat0=20.0)])
        )
        out = terrain.grid_composite(sdf, cell_deg=0.05).collect()
        # 4 m × 4 m images sit entirely inside one 0.05° cell
        assert len(out) == 1
        r = out[0]
        assert r.n_px == 16 + 15 and r.n_img == 2
        assert r.max_val == 30.0
        assert r.mean_val == round((16 * 10.0 + 15 * 30.0) / 31.0, 4)
        assert r.cx == 200 and r.cy == 399  # floor(10.0x/0.05), floor(19.99x/0.05)

    def test_cells_split_across_lattice(self, spark):
        # image straddling a lattice boundary in lon: cell edge at 10.0°
        g = np.full((2, 2), 5.0, dtype=np.float32)
        # xres huge so the two pixel columns land either side of 10.0°
        sdf = spark.createDataFrame(
            pd.DataFrame([_img("s", g, xres=6000.0, yres=1.0, lon0=9.99, lat0=20.0)])
        )
        out = terrain.grid_composite(sdf, cell_deg=0.05).collect()
        assert len(out) == 2  # split across two lon cells
        assert sum(r.n_px for r in out) == 4
