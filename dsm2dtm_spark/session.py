"""SparkSession builder with the engine's scale-oriented defaults.

Single place that encodes the execution-model decisions (SURVEY.md §4.2):
AQE on (runtime re-planning + skew-join splitting + partition coalescing),
Arrow on with a small batch row cap (rows carry multi-MB image payloads — the
default 10k rows/batch would materialize GBs per Arrow batch in the Python
worker), and a shuffle-partition count sized to the local core budget.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 64  # ≈ 64 × (few MB) decoded per python-worker batch


# Python workers allocate/free MB-scale numpy buffers constantly; with
# glibc's default mmap threshold every free munmaps, and munmap fires TLB
# shootdown IPIs that serialize ALL cores (measured: 12 → 38 Mpix/s at 32
# workers on this box). Keep large buffers on the heap instead.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "268435456",
}


def get_spark(
    app_name: str = "dsm2dtm-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)  # local mode: python workers inherit this
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # floor scan parallelism at the core budget (guide §6): a 126 MB
        # 6-row-group parquet otherwise becomes TWO 64 MB splits — every
        # probe/agg over it then runs on 2 of 32 cores. The floor is
        # scale-adaptive by construction: big inputs already exceed it (the
        # bytes ceiling governs), small inputs split down to row-group
        # granularity so cores stay busy. Parameterised via cores, never a
        # local-only constant.
        .config("spark.sql.files.minPartitionNum", str(2 * cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)  # real clusters: per-executor
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
