"""Sequence packing for LLM training-data pipelines.

The standard pretraining scheme — "greedy concat then chunk": documents are
concatenated in a deterministic order and cut into fixed token-budget
chunks. A document's ``pack_idx`` is the chunk its FIRST token lands in and
``offset_in_pack`` its token offset inside that chunk; documents may
straddle chunk boundaries (the chunker splits them at training time, the
packer does not).

Scale shape: packing runs per BUCKET (``pmod(doc_id, n_buckets)``) — the
only shuffle is the window's partition-by-bucket exchange, and each bucket
packs independently in parallel. ``n_buckets`` is a FIXED constant, never
cluster-derived, so the assignment is deterministic across any cluster
size. A single global window would serialize the cumsum behind one task at
100 TB; bucketed packing loses nothing (chunks have no cross-bucket
meaning) and parallelizes fully. All JVM built-ins — no Python in the plan.

Sizing ``n_buckets``: within a bucket the cumsum is inherently sequential
(one sorted window task per bucket), so pick n_buckets ≫ cluster cores and
small enough per-bucket data to sort in memory — e.g. 2^16 for a 100 TB
corpus (~1.5 GB/bucket, 65536-way parallel). It must stay FIXED per
dataset (it defines the pack layout), not derived from the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dsm2dtm_spark.functions.text import token_count


def pack_documents(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, n_tokens, pack_idx, offset_in_pack) per document.

    ``pack_idx`` is bucket-local: the global pack key is (bucket,
    pack_idx). Token counts use the engine's whitespace tokenizer
    (functions/text.token_count — the SQL-replayable baseline).
    """
    if budget_tokens <= 0 or n_buckets <= 0:
        raise ValueError("budget_tokens and n_buckets must be positive")
    base = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    # `div` is exact long division, matching the oracle's BIGINT `//`;
    # floor(cum / budget) would round through a double and can be off by
    # one once a bucket's cumulative count nears 2^53
    return base.withColumn("cum", cum).select(
        id_col,
        "bucket",
        "n_tokens",
        F.expr(f"CAST(cum div {int(budget_tokens)} AS BIGINT)").alias("pack_idx"),
        (F.col("cum") % F.lit(budget_tokens)).cast("long").alias("offset_in_pack"),
    )
