"""Deterministic stratified sampling for training-data curation.

Corpus curation constantly downsamples by stratum — "keep at most N pages
per domain", "cap each language at its quota" — and the decisions must be
REPRODUCIBLE: a rerun (or the same job at a different cluster size) has to
pick the same rows, or every pipeline rerun trains on a different corpus.
``df.sample()`` can't give that (seed + partitioning dependent), so the
sample key here is md5 of the row id — a uniform, engine-portable
pseudo-random permutation that any SQL engine replays exactly.

Scale shape: a naive per-stratum ranking window would hash ALL of a
stratum's rows into one task's sort — with ~tens of language strata over
a web corpus that caps parallelism at n_strata and OOMs the big-stratum
task. Instead a LOCAL top-N per (input partition, stratum) runs first
(the window partitions on (stratum, partition-id), so it parallelizes
with the input); only the ≤ N·numPartitions surviving candidates per
stratum reach the exact global window. Every global top-N row survives
its own partition's local top-N, so the result is identical — the
map-side-combine trick, applied to a ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen by ranking each
    stratum's rows on md5(id) (ties broken by id — total order, so the
    result is a pure function of the data, independent of partitioning).
    Adds ``sample_rank`` (1-based position in the stratum's hash order);
    strata smaller than the quota keep all their rows."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    # materialize the sort key and partition id as columns: the local
    # window must order by the exact same key, and spark_partition_id()
    # (nondeterministic) is only allowed in a projection
    keyed = df.withColumn("_skey", F.md5(F.col(id_col).cast("string"))).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy(strata_col, "_pid").orderBy("_skey", F.col(id_col))
    cand = (
        keyed.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= n_per_stratum)
        .drop("_lrn", "_pid")
    )
    w = Window.partitionBy(strata_col).orderBy("_skey", F.col(id_col))
    return (
        cand.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("_skey")
    )
