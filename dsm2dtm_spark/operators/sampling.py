"""Deterministic stratified sampling for training-data curation.

Corpus curation constantly downsamples by stratum — "keep at most N pages
per domain", "cap each language at its quota" — and the decisions must be
REPRODUCIBLE: a rerun (or the same job at a different cluster size) has to
pick the same rows, or every pipeline rerun trains on a different corpus.
``df.sample()`` can't give that (seed + partitioning dependent), so the
sample key here is md5 of the row id — a uniform, engine-portable
pseudo-random permutation that any SQL engine replays exactly.

Scale shape: one shuffle on the stratum key for the ranking window
(sort-based window, the same cost class as any groupBy); no driver-side
state, no collect.
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
    result is a pure function of the data). Adds ``sample_rank`` (1-based
    position in the stratum's hash order); strata smaller than the quota
    keep all their rows."""
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )
