"""Cell-index tests: the three implementations (numpy / Spark Column / shared
SQL string) must agree bit-for-bit, and the quadtree semantics must hold —
this is what makes every cell-keyed join oracle-checkable (SURVEY.md E3)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark.operators import cellindex as ci


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(10)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    # include edge cases
    lon = np.concatenate([lon, [-180.0, 180.0, 0.0, 179.9999]])
    lat = np.concatenate([lat, [-90.0, 90.0, 0.0, 89.9999]])
    return lon, lat


class TestNumpy:
    def test_roundtrip_decode(self, coords):
        lon, lat = coords
        for res in (0, 5, 12, 26):
            ids = ci.encode_cells(lon, lat, res)
            ix, iy, r = ci.decode_cells(ids)
            assert (r == res).all()
            ex, ey = ci.grid_coords(lon, lat, res)
            np.testing.assert_array_equal(ix, ex)
            np.testing.assert_array_equal(iy, ey)

    def test_ids_positive_int64(self, coords):
        lon, lat = coords
        ids = ci.encode_cells(lon, lat, 26)
        assert ids.dtype == np.int64
        assert (ids >= 0).all()

    def test_hierarchy(self, coords):
        lon, lat = coords
        fine = ci.encode_cells(lon, lat, 14)
        coarse = ci.encode_cells(lon, lat, 8)
        np.testing.assert_array_equal(ci.parent_cell(fine, 8), coarse)

    def test_center_within_cell(self):
        ids = ci.encode_cells(np.array([2.35]), np.array([48.86]), 12)
        lon_c, lat_c = ci.cell_center(ids)
        again = ci.encode_cells(lon_c, lat_c, 12)
        np.testing.assert_array_equal(again, ids)

    def test_ring_cells(self):
        c = int(ci.encode_cells(np.array([10.0]), np.array([50.0]), 10)[0])
        ring = ci.ring_cells(c, 1)
        assert len(ring) == 9
        assert c in ring
        ix, iy, _ = ci.decode_cells(ring)
        cx, cy, _ = ci.decode_cells(np.array([c]))
        assert np.abs(ix - cx[0]).max() <= 1 and np.abs(iy - cy[0]).max() <= 1

    def test_cover_bbox(self):
        cells = ci.cover_bbox(0.0, 0.0, 1.0, 1.0, 8)
        # every cell center must be inside the (slightly padded) bbox
        lon_c, lat_c = ci.cell_center(cells)
        pad = 360.0 / (1 << 8)
        assert (lon_c > -pad).all() and (lon_c < 1 + pad).all()
        assert len(cells) == len(set(cells.tolist()))

    def test_locality_of_morton(self):
        # neighboring points at fine res share coarse parents
        a = ci.encode_cells(np.array([10.0001]), np.array([50.0001]), 20)
        b = ci.encode_cells(np.array([10.0002]), np.array([50.0002]), 20)
        assert ci.parent_cell(a, 6)[0] == ci.parent_cell(b, 6)[0]


class TestSqlParity:
    @pytest.mark.parametrize("res", [4, 10, 16, 26])
    def test_duckdb_matches_numpy(self, coords, res):
        lon, lat = coords
        want = ci.encode_cells(lon, lat, res)
        pdf = pd.DataFrame({"lon": lon, "lat": lat})
        expr = ci.cell_encode_sql("lon", "lat", res)
        got = duckdb.sql(f"SELECT {expr} AS cell FROM pdf").df()["cell"].to_numpy()
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("res", [10, 16])
    def test_spark_sql_and_column_match_numpy(self, spark, coords, res):
        lon, lat = coords
        want = ci.encode_cells(lon, lat, res)
        sdf = spark.createDataFrame(pd.DataFrame({"i": range(len(lon)), "lon": lon, "lat": lat}))
        expr = ci.cell_encode_sql("lon", "lat", res)
        got_sql = np.array(
            [r.cell for r in sdf.selectExpr("i", f"{expr} AS cell").orderBy("i").collect()], dtype=np.int64
        )
        np.testing.assert_array_equal(got_sql, want)
        got_col = np.array(
            [r.cell for r in sdf.select("i", ci.cell_expr(sdf.lon, sdf.lat, res).alias("cell")).orderBy("i").collect()],
            dtype=np.int64,
        )
        np.testing.assert_array_equal(got_col, want)
