"""Similarity search over embedding columns (array<float>), for the
training-data pipeline: brute-force cosine top-k as the exact baseline, and an
LSH-bucketed approximate variant as the scale path.

Scale notes: brute force is a broadcast of the (small) query set against the
(huge) corpus — a single pass, no shuffle of the corpus; dot products run as
JVM ``aggregate``/``zip_with`` expressions inside whole-stage codegen, never
row-at-a-time Python. The LSH variant buckets by sign-random-projection bits
so candidate generation is an equi-join on bucket id; recall/latency trade
via n_planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, left_col: str, right_col: str, out_col: str = "cosine") -> DataFrame:
    a, b = F.col(left_col).cast("array<double>"), F.col(right_col).cast("array<double>")
    return df.withColumn(out_col, F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, ranking window.
    Self-matches (same id) are excluded when id columns share a namespace.
    Ties break on the corpus id (deterministic)."""
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = with_cosine(pairs, "qvec", "cvec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-random-projection bucket id: bit i = sign(v·plane_i). Planes are a
    deterministic seeded matrix broadcast as literals (n_planes ≤ 16)."""
    bits = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(F.col(vec_col).cast("array<double>"), arr)
        bit = F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits.bitwiseOR(bit)
    return bits.cast("long")


def make_planes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n_planes, dim))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: SRP-bucket both sides, equi-join on bucket,
    rank within candidates. Recall < 1 by design; the exact verifier is
    brute_force_topk (used in tests to measure recall)."""
    planes = make_planes(dim, n_planes)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
        srp_bucket_expr(query_vec_col, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        srp_bucket_expr(vec_col, planes).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), on="bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = with_cosine(pairs, "qvec", "cvec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
