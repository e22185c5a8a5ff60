"""SQL-callable engine functions: spark.sql() results must match the
DataFrame/numpy forms bit-for-bit (three implementations of the cell index
already cross-check; this adds the SQL-UDF surface as a fourth)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dsm2dtm_spark.functions.sqlfuncs import register_sql_functions
from dsm2dtm_spark.operators import cellindex


@pytest.fixture(scope="module")
def funcs(spark):
    return register_sql_functions(spark)


class TestSqlFunctions:
    def test_cell_encode_matches_numpy(self, spark, funcs):
        rng = np.random.default_rng(6)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        df.createOrReplaceTempView("pts")
        for res in (8, 12, 14):
            got = [r.c for r in spark.sql(f"SELECT cell_encode_r{res}(lon, lat) AS c FROM pts").collect()]
            want = cellindex.encode_cells(lon, lat, res).tolist()
            assert got == want, res

    def test_cell_parent_matches_numpy(self, spark, funcs):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 100)
        lat = rng.uniform(-90, 90, 100)
        cells = cellindex.encode_cells(lon, lat, 14)
        df = spark.createDataFrame(pd.DataFrame({"cell_id": cells}))
        df.createOrReplaceTempView("cells14")
        got = [r.p for r in spark.sql("SELECT cell_parent(cell_id, 8) AS p FROM cells14").collect()]
        want = cellindex.parent_cell(cells, 8).tolist()
        assert got == want

    def test_cell_parent_above_own_res_is_null(self, spark, funcs):
        # parent_res > encoded res would make the shift count negative —
        # Java masks it to 6 bits and returns garbage while the numpy twin
        # raises; the SQL surface must return NULL instead (ADVICE r2)
        cells = cellindex.encode_cells(np.array([10.0]), np.array([20.0]), 8)
        df = spark.createDataFrame(pd.DataFrame({"cell_id": cells}))
        df.createOrReplaceTempView("cells8")
        got = spark.sql("SELECT cell_parent(cell_id, 14) AS p, cell_parent(cell_id, 8) AS same FROM cells8").collect()[0]
        assert got.p is None
        assert got.same == int(cells[0])  # parent at own res = identity, still works

    def test_utm_epsg_matches_golden(self, spark, funcs):
        from dsm2dtm_spark.golden import estimate_utm_epsg

        pts = [(2.0, 36.0), (-74.0, 40.7), (151.2, -33.9), (-180.0, -90.0), (179.9, 89.9)]
        df = spark.createDataFrame(pd.DataFrame(pts, columns=["lon", "lat"]))
        df.createOrReplaceTempView("utm_pts")
        got = [r.e for r in spark.sql("SELECT utm_epsg(lon, lat) AS e FROM utm_pts").collect()]
        assert got == [estimate_utm_epsg(lo, la) for lo, la in pts]

    def test_scalar_helpers(self, spark, funcs):
        row = spark.sql(
            "SELECT cell_size_m(0.5d, 2.0d) AS cs, cell_size_m(0.0d, 0.0d) AS floor_cs, "
            "writer_safe_nodata(double('nan')) AS wn, writer_safe_nodata(-99999.0d) AS keep"
        ).collect()[0]
        assert row.cs == 1.25 and row.floor_cs == 0.001
        assert row.wn == -9999.0 and row.keep == -99999.0

    def test_stays_jvm_side(self, spark, funcs):
        # SQL UDFs inline as catalyst expressions: no Python evaluator node
        plan = spark.sql("SELECT cell_encode_r12(1.0d, 2.0d) AS c")._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
