"""Whole-image DSM→DTM Spark job (SURVEY.md §7.1 step 4; reference lifecycle
core.py:207-251 re-expressed as one declarative plan).

One image = one UDF group: the image+caption regime (grids ≤ ~2k on a side)
processes each row's grid entirely inside a ``mapInPandas`` stage — bit-exact
vs the golden single-node pipeline by construction, zero halo machinery, and
embarrassingly parallel across executors. The Arrow batch row cap
(session.ARROW_BATCH_ROWS) bounds Python-worker memory; Catalyst keeps scan
pruning/pushdown because everything upstream of the UDF is plain DataFrame.

Per-partition lineage + throughput metrics ride on every output row
(partition_id, wall_ms) per the north_rule; aggregate with
``lineage_metrics``.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dsm2dtm_spark import codecs, golden
from dsm2dtm_spark.util import ensure_min_partitions
from dsm2dtm_spark.params import (
    DEFAULT_RADIUS_M,
    NODATA_DEFAULT,
    PMF_INIT_THRESHOLD,
    PMF_MAX_THRESHOLD,
)

DTM_OUTPUT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
        StructField("valid_in", LongType()),
        StructField("valid_out", LongType()),
        StructField("wall_ms", DoubleType()),
        StructField("partition_id", IntegerType()),
        StructField("error", StringType()),
    ]
)


def dtm_transform(
    images: DataFrame,
    radius_m: float | None = DEFAULT_RADIUS_M,
    slope: float | None = None,
    nodata: float = NODATA_DEFAULT,
    min_parallelism: int | None = None,
    permissive: bool = False,
    init_threshold: float = PMF_INIT_THRESHOLD,
    max_threshold: float = PMF_MAX_THRESHOLD,
) -> DataFrame:
    """images(image_id, bytes, w, h, fmt, caption, xres_m, yres_m, ...) →
    DTM rows in the same codec, plus lineage/metrics columns.

    ``permissive=True``: a corrupt payload no longer kills the job — the row
    comes back with null bytes and the exception recorded in ``error``
    (filter ``error IS NULL`` for clean rows, route the rest to a quarantine
    sink). At 10^12 rows a poison row is a certainty, not an edge case.

    ``min_parallelism``: compute is ~10^3× heavier per byte than the scan, so
    a low-partition input (one fat parquet file) would serialize the whole job
    behind one task. When the scan yields fewer partitions, repartition up —
    the shuffle moves only encoded bytes, negligible next to the pixel math.
    Defaults to 3× the cluster's default parallelism.
    """
    golden.validate_job_params(radius_m if radius_m is not None else DEFAULT_RADIUS_M, slope)
    images = ensure_min_partitions(images, min_parallelism, mult=3)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            out = {k: [] for k in DTM_OUTPUT_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                try:
                    grid = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                    dtm = golden.dsm_to_dtm(
                        grid,
                        (float(row.xres_m), float(row.yres_m)),
                        radius_m=radius_m,
                        slope=slope,
                        nodata=nodata,
                        init_threshold=init_threshold,
                        max_threshold=max_threshold,
                    )
                    data = codecs.encode(dtm, row.fmt, nodata)
                except Exception as exc:  # noqa: BLE001 — quarantined, not swallowed
                    if not permissive:
                        raise
                    out["image_id"].append(row.image_id)
                    out["bytes"].append(None)
                    out["w"].append(int(row.w))
                    out["h"].append(int(row.h))
                    out["fmt"].append(row.fmt)
                    out["caption"].append(row.caption)
                    out["phash"].append(0)
                    out["valid_in"].append(0)
                    out["valid_out"].append(0)
                    out["wall_ms"].append((time.perf_counter() - t0) * 1000.0)
                    out["partition_id"].append(pid)
                    out["error"].append(f"{type(exc).__name__}: {exc}"[:500])
                    continue
                out["image_id"].append(row.image_id)
                out["bytes"].append(data)
                out["w"].append(int(row.w))
                out["h"].append(int(row.h))
                out["fmt"].append(row.fmt)
                out["caption"].append(row.caption)
                out["phash"].append(codecs.ahash64(dtm, nodata))
                out["valid_in"].append(int(np.sum(grid != nodata)))
                out["valid_out"].append(int(np.sum(dtm != nodata)))
                out["wall_ms"].append((time.perf_counter() - t0) * 1000.0)
                out["partition_id"].append(pid)
                out["error"].append(None)
            yield pd.DataFrame(out)

    return images.mapInPandas(process, DTM_OUTPUT_SCHEMA)


def resume_remaining(images: DataFrame, done: DataFrame | None) -> DataFrame:
    """Checkpoint-resume: drop rows whose image_id is already committed —
    a left-anti join against the output snapshot (SURVEY.md E12)."""
    if done is None:
        return images
    return images.join(done.select("image_id"), on="image_id", how="left_anti")


def run_dtm_job(
    spark,
    input_table,
    output_table,
    radius_m: float | None = DEFAULT_RADIUS_M,
    slope=None,
    init_threshold: float = PMF_INIT_THRESHOLD,
    max_threshold: float = PMF_MAX_THRESHOLD,
    permissive: bool = False,
):
    """End-to-end: snapshot scan → resume anti-join → transform → snapshot
    commit. Returns (n_processed, snapshot). Rerunning after a partial commit
    processes only the remainder (exactly-once via the atomic manifest)."""
    golden.validate_job_params(radius_m if radius_m is not None else DEFAULT_RADIUS_M, slope)
    src = input_table.read(spark)
    try:
        done = output_table.read(spark)
    except ValueError:
        done = None
    todo = resume_remaining(src, done)
    n = todo.count()  # cheap: column-pruned metadata scan, never decodes bytes
    if n == 0:
        return 0, output_table.current_snapshot()
    result = dtm_transform(
        todo,
        radius_m=radius_m,
        slope=slope,
        init_threshold=init_threshold,
        max_threshold=max_threshold,
        permissive=permissive,
    )
    snap = output_table.write_dataframe(result, summary={"rows": n, "op": "dtm"})
    return n, snap


def lineage_metrics(dtm_rows: DataFrame) -> DataFrame:
    """Per-partition lineage/throughput aggregation (north_rule metrics)."""
    return dtm_rows.groupBy("partition_id").agg(
        F.count("*").alias("n_images"),
        F.sum(F.col("w").cast("long") * F.col("h").cast("long")).alias("pixels"),
        F.round(F.sum("wall_ms") / 1000.0, 3).alias("compute_sec"),
        F.round(F.sum(F.col("w").cast("long") * F.col("h").cast("long")) / F.sum("wall_ms") / 1000.0, 3).alias(
            "mpix_per_sec"
        ),
    )
