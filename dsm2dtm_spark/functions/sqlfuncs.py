"""SQL-callable engine functions (SURVEY.md E14 — the SQL API surface).

Spark 4 supports SQL scalar UDFs (``CREATE TEMPORARY FUNCTION … RETURN
<expr>``): the body is a catalyst expression, so these stay JVM-side inside
whole-stage codegen — no Python round trip, unlike ``spark.udf.register``.
``register_sql_functions`` publishes the engine's scalar functions to a
session so ``spark.sql()`` users get the same semantics the DataFrame API
exposes (and the same arithmetic the DuckDB oracles replay):

- ``cell_encode_r{res}(lon, lat)``  S2-style Morton cell id at resolution res
- ``cell_parent(cell_id, parent_res)``  ancestor cell (S2 truncation)
- ``utm_epsg(lon, lat)``  UTM zone EPSG (reference utm_utils.py:42-45 math)
- ``cell_size_m(xres, yres)``  collapsed cell size (reference algorithm.py:476-478)
- ``writer_safe_nodata(nodata)``  non-finite → −9999.0 (plugin _safe_nodata)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from dsm2dtm_spark.operators.cellindex import cell_encode_sql

DEFAULT_CELL_RES_LEVELS = (8, 12, 14)


def register_sql_functions(spark: SparkSession, res_levels: tuple[int, ...] = DEFAULT_CELL_RES_LEVELS) -> list[str]:
    """Create the temporary SQL functions in this session; returns the names.
    Idempotent (CREATE OR REPLACE)."""
    created = []

    for res in res_levels:
        name = f"cell_encode_r{res}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(lon DOUBLE, lat DOUBLE) "
            f"RETURNS BIGINT RETURN {cell_encode_sql('lon', 'lat', res)}"
        )
        created.append(name)

    # ancestor cell: drop 2 Morton bits per level, reattach the new res tag.
    # Guard: parent_res above the cell's own res would make the shift count
    # negative, which Java masks to 6 bits (garbage ids, silently diverging
    # from the numpy twin, which raises) — return NULL instead.
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cell_parent(cell_id BIGINT, parent_res INT) "
        "RETURNS BIGINT RETURN "
        "CASE WHEN parent_res > CAST(cell_id & 31 AS INT) THEN NULL ELSE "
        "shiftleft(shiftright(shiftright(cell_id, 5), CAST(2 * ((cell_id & 31) - parent_res) AS INT)), 5) "
        "| CAST(parent_res AS BIGINT) END"
    )
    created.append("cell_parent")

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION utm_epsg(lon DOUBLE, lat DOUBLE) "
        "RETURNS BIGINT RETURN "
        "CAST(CASE WHEN lat < 0 THEN 32700 ELSE 32600 END "
        "+ (CAST(FLOOR((lon + 180.0) / 6.0) AS BIGINT) % 60 + 1) AS BIGINT)"
    )
    created.append("utm_epsg")

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cell_size_m(xres DOUBLE, yres DOUBLE) "
        "RETURNS DOUBLE RETURN GREATEST((ABS(xres) + ABS(yres)) / 2.0, 0.001)"
    )
    created.append("cell_size_m")

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION writer_safe_nodata(nodata DOUBLE) "
        "RETURNS DOUBLE RETURN CASE WHEN isnan(nodata) OR nodata = double('inf') "
        "OR nodata = double('-inf') OR nodata IS NULL THEN -9999.0 ELSE nodata END"
    )
    created.append("writer_safe_nodata")

    return created
