"""Bucketed co-located joins (SURVEY §2/§4: pre-partitioning big joins so the
per-key join needs no shuffle at read time).

At 100 TB the repeated joins in this engine — tiles ⋈ per-image stats,
output ⋈ input on image_id, footprint candidates ⋈ assignments on cell_id —
pay a full shuffle of the big side every run. Writing both sides bucketed by
the join key (`bucketBy` + `sortBy`, hive-style table) lets Spark plan a
SortMergeJoin with NO Exchange on either side: the bucket files are the
shuffle, paid once at write time and amortized over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 16) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (idempotent replace)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner emits a
    shuffle-free SortMergeJoin (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
