"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None, mult: int = 2) -> DataFrame:
    """Repartition an encoded-image input UP when the scan yields fewer than
    ``min_partitions`` (default ``mult × defaultParallelism``) partitions.

    Pixel compute is orders of magnitude heavier per byte than the scan, so a
    low-partition input (one fat parquet file; big rows packing few per input
    split) would serialize the whole job behind a handful of tasks — the byte
    shuffle is cheap insurance against idle executors. Shared by the
    whole-image plan, the tiled plan, and the terrain operators so the guard
    evolves in one place.
    """
    if min_partitions is None:
        min_partitions = mult * df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df
