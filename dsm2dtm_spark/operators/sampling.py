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


def _permutation_key(id_col: str, seed: int):
    """The engine's portable pseudo-random permutation key: md5 of
    'seed:id'. Any SQL engine replays it exactly; same seed ⇒ same total
    order regardless of partitioning or cluster size."""
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))


def _bucket_prefix_len(n_buckets: int) -> int:
    """Hex-prefix length whose 16^len ranges cover ``n_buckets`` (rounded
    up to whole hex characters): 16 ⇒ 1, 256 ⇒ 2, 4096 ⇒ 3."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return max(1, -(-(max(n_buckets, 2) - 1).bit_length() // 4))  # ceil(log16)


def global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_buckets: int = 256,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global training-order permutation: every row gets a
    1-based ``shuffle_rank`` equal to its position in the md5(seed:id)
    order (ties broken by id — a total order, so the permutation is a pure
    function of data + seed; rerun, repartition, or resize the cluster and
    the order is identical).

    Scale shape: a naive global ROW_NUMBER is one executor sorting the
    whole corpus. Instead the hash key's leading hex digits split rows into
    ranges that the key order already respects (hex prefix = most
    significant digits), each bucket ranks locally in parallel, and a tiny
    exclusive-cumsum of bucket counts (computed in-plan, broadcast back)
    turns local ranks into global ones. Two narrow shuffles of (key, id),
    never a single-task sort. ``n_buckets`` is rounded UP to the next power
    of 16 (the prefix is whole hex characters): 256 ⇒ 2 chars, 4096 ⇒ 3 —
    size it so corpus_rows / n_buckets fits one task's local sort."""
    keyed = df.withColumn("_skey", _permutation_key(id_col, seed)).withColumn(
        "_bucket", F.substring("_skey", 1, _bucket_prefix_len(n_buckets))
    )
    counts = keyed.groupBy("_bucket").count()
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_offset")
    )  # the window runs over ≤ n_buckets rows — trivially single-task
    w_local = Window.partitionBy("_bucket").orderBy("_skey", F.col(id_col))
    return (
        keyed.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), on="_bucket")
        .withColumn(rank_col, (F.col("_offset") + F.col("_lrn")).cast("long"))
        .drop("_skey", "_bucket", "_lrn", "_offset")
    )


def rate_threshold_hex(rate: float, digits: int = 13) -> str | None:
    """Per-row keep rate → md5-hex-prefix threshold: a row survives iff the
    first ``digits`` hex chars of its permutation key are lexicographically
    below this string. Pure string comparison — no float arithmetic in the
    plan, so Spark and any SQL oracle agree exactly. None ⇒ keep all."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return None
    return format(int(rate * (16**digits)), f"0{digits}x")


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source deterministic Bernoulli mixture draw: each row survives
    with its source's rate, decided by the row's md5(seed:id) key — the
    reproducible version of weighted corpus mixing ("keep 30% of web, all
    of books"). Same seed ⇒ same sample at any partitioning/cluster size,
    and a RERUN over a grown corpus keeps exactly the previously-kept rows
    of unchanged ids (stable curation). Sources absent from ``rates`` get
    ``default_rate``. The per-source thresholds are literals in the plan
    (rates are a KB-scale dict), so the filter is one CASE over a string
    comparison — pushdown-friendly, zero joins."""
    key13 = F.substring(_permutation_key(id_col, seed), 1, 13)
    expr = None
    src = F.col(source_col)
    for name, rate in sorted(rates.items()):
        th = rate_threshold_hex(rate)
        cond = F.lit(True) if th is None else key13 < F.lit(th)
        expr = F.when(src == name, cond) if expr is None else expr.when(src == name, cond)
    dth = rate_threshold_hex(default_rate)
    default_cond = F.lit(True) if dth is None else key13 < F.lit(dth)
    keep = default_cond if expr is None else expr.otherwise(default_cond)
    return df.filter(keep)


def temperature_rates(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 0.7,
    target_rows: int | None = None,
) -> dict[str, float]:
    """Temperature-weighted mixture rates from observed source counts:
    p_s ∝ n_s^temperature (T=1 → natural proportions; T→0 → uniform over
    sources — the standard multilingual/multi-source rebalance), scaled so
    the expected sample size is ``target_rows`` (default: the size of the
    smallest source times the number of sources — full uniform coverage
    without upsampling). Rates cap at 1.0 (no oversampling). The per-source
    count collect is the one driver action — KB-scale, the same justified
    pattern as simsearch.train_centroids."""
    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()}
    if not counts:
        return {}
    weights = {s: n**temperature for s, n in counts.items()}
    total_w = sum(weights.values())
    if target_rows is None:
        target_rows = min(counts.values()) * len(counts)
    return {
        s: min(1.0, target_rows * (weights[s] / total_w) / counts[s]) for s in counts
    }
