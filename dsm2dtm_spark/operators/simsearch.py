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
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType


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


def _srp_multi_buckets(df: DataFrame, vec_col: str, out_id: str, planes_per_table: list[np.ndarray]) -> DataFrame:
    """One row per (vector, table): bucket = table_idx composed with the
    table's sign bits — the standard multi-table SRP layout (union of tables
    recovers the recall a single bit-vector table cannot reach).

    All tables' sign bits come from ONE Arrow-batched matrix multiply per
    batch (stacked planes), not per-plane JVM expressions — at 8 tables × 6
    bits the expression form was slower than brute force."""
    stacked = np.vstack(planes_per_table)  # (T*B, dim)
    n_planes = planes_per_table[0].shape[0]
    n_tables = len(planes_per_table)

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (m @ stacked.T) >= 0  # (n, T*B)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        out = []
        for row in signs.reshape(len(m), n_tables, n_planes):
            ids = (row * weights).sum(axis=1) | (np.arange(n_tables, dtype=np.int64) << 48)
            out.append(ids.tolist())
        return pd.Series(out)

    return df.select(F.col(vec_col).alias("_v"), F.col(out_id), F.explode(buckets(F.col(vec_col))).alias("bucket"))


def make_planes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n_planes, dim))


def cosine_dedup(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup dedup, leader style: a row is dropped when
    some LOWER-id row is cosine-similar above ``threshold`` (every duplicate
    cluster keeps its smallest id; deterministic, SQL-replayable). Candidate
    generation here is the exact cross join — swap in minhash-style LSH
    buckets (lsh_topk's tables) for 10⁹-row corpora."""
    a = corpus.select(F.col(id_col).alias("keep_id"), F.col(vec_col).alias("lv"))
    b = corpus.select(F.col(id_col).alias("drop_id"), F.col(vec_col).alias("rv"))
    pairs = a.crossJoin(b).filter(F.col("keep_id") < F.col("drop_id"))
    dupes = (
        with_cosine(pairs, "lv", "rv")
        .filter(F.col("cosine") >= threshold)
        .select("drop_id")
        .distinct()
    )
    return corpus.join(dupes, corpus[id_col] == dupes.drop_id, "left_anti")


def make_centroids(dim: int, n_centroids: int = 16, seed: int = 13) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids (IVF without the
    training pass: seeded random directions; at real scale these would come
    from a sampled k-means job, which is a drop-in replacement)."""
    c = np.random.default_rng(seed).normal(size=(n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _argmax_centroid(vec_col: str, centroids: np.ndarray):
    """Column: index of the max-dot-product centroid (JVM-side).

    Built as array_position(dots, array_max(dots)) — a chained when() would
    double the expression tree per centroid (2^k nodes) and OOM the driver."""
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(*[_dot(v, F.array(*[F.lit(float(x)) for x in c])) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: assign every corpus vector to its nearest
    coarse centroid (inverted lists = partition key), probe the ``nprobe``
    nearest lists per query, rank candidates exactly.

    Scale shape: the corpus is scanned once to build list assignments (a
    column, persistable/partitionable); queries explode to nprobe rows and
    the candidate join is a plain equi-join on the list id — never O(n·q).
    """
    cents = make_centroids(dim, n_centroids)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _argmax_centroid(vec_col, cents).alias("list_id"),
    )

    def probe_lists_udf():
        @F.pandas_udf(ArrayType(IntegerType()))
        def probes(vecs: pd.Series) -> pd.Series:
            m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cents.T
            order = np.argsort(-sims, axis=1)[:, :nprobe]
            return pd.Series([row.astype("int32").tolist() for row in order])

        return probes

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qvec"),
        F.explode(probe_lists_udf()(F.col(query_vec_col))).alias("list_id"),
    )
    pairs = c.join(F.broadcast(q), on="list_id").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = with_cosine(pairs, "qvec", "cvec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 6,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table SRP-LSH: ``n_tables``
    independent sign-projection tables of ``n_planes`` bits each; candidates
    are the union of per-table bucket collisions (distinct pairs), then exact
    rerank. Recall/latency trade via (n_planes, n_tables): fewer planes →
    bigger buckets, more tables → more chances to collide. The exact verifier
    is brute_force_topk (tests measure recall)."""
    rng_tables = [make_planes(dim, n_planes, seed=7 + 101 * t) for t in range(n_tables)]
    q = _srp_multi_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qvec")),
        "qvec",
        "query_id",
        rng_tables,
    ).withColumnRenamed("_v", "qvec")
    c = _srp_multi_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        "cvec",
        "neighbor_id",
        rng_tables,
    ).withColumnRenamed("_v", "cvec")
    pairs = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = with_cosine(pairs, "qvec", "cvec")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
