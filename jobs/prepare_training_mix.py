"""spark-submit job: the LAST MILE of the training-data pipeline — turn a
curated corpus into a training-ready, ordered, packed dataset:

    scan corpus → [--eval-set] benchmark decontamination
        → temperature-weighted mixture draw (per-source rates from observed
          counts; deterministic md5-threshold Bernoulli)
        → deterministic global shuffle (the training order — a pure
          function of data + seed at any cluster size)
        → sequence packing in SHUFFLE order (greedy concat-then-chunk:
          each doc gets its (bucket, pack_idx, offset_in_pack) under a
          fixed token budget)
        → atomic snapshot commit, hive-partitioned by pack bucket

    zip -qr engine.zip dsm2dtm_spark
    spark-submit --py-files engine.zip jobs/prepare_training_mix.py \
        --corpus /path/to/corpus_table --output /path/to/mix_table \
        [--temperature 0.7] [--target-rows N] [--seed 0] \
        [--budget-tokens 2048] [--n-buckets 64] [--eval-set eval.parquet]

Everything is deterministic given (corpus, seed): rerunning produces the
identical sample, order, and pack layout — the property that makes training
runs reproducible and resumable. A JSON metrics line goes to stdout.
"""

from __future__ import annotations

import argparse
import json


def prepare_training_mix(
    spark,
    corpus,
    eval_docs=None,
    source_col: str = "source",
    temperature: float = 0.7,
    target_rows: int | None = None,
    seed: int = 0,
    budget_tokens: int = 2048,
    n_buckets: int = 64,
    ngram: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """corpus → (training-mix DataFrame, metrics). Output columns: every
    corpus column + shuffle_rank (the training order), bucket, n_tokens,
    pack_idx, offset_in_pack. Pack assignment runs over the SHUFFLE rank
    (consecutive ranks pack together within a bucket), so the chunk layout
    follows the training order, not ingestion order."""
    from pyspark.sql import functions as F

    from dsm2dtm_spark.operators.decontam import decontaminate
    from dsm2dtm_spark.operators.packing import pack_documents
    from dsm2dtm_spark.operators.sampling import global_shuffle, mixture_sample, temperature_rates

    metrics = {"input": corpus.count()}
    if eval_docs is not None:
        corpus = decontaminate(corpus, eval_docs, n=ngram, text_col=text_col, id_col=id_col)
        corpus = corpus.localCheckpoint(eager=False)
        metrics["after_decontam"] = corpus.count()

    rates = temperature_rates(corpus, source_col=source_col, temperature=temperature, target_rows=target_rows)
    sampled = mixture_sample(corpus, rates, source_col=source_col, id_col=id_col, seed=seed)
    sampled = sampled.localCheckpoint(eager=False)
    metrics["sampled"] = sampled.count()
    metrics["rates"] = {k: round(v, 6) for k, v in sorted(rates.items())}

    shuffled = global_shuffle(sampled, id_col, seed=seed)
    packed = pack_documents(
        shuffled, budget_tokens=budget_tokens, n_buckets=n_buckets,
        id_col="shuffle_rank", text_col=text_col,
    ).withColumnRenamed("shuffle_rank", "_sr")
    # materialize once: the metrics agg below and the caller's write would
    # otherwise each re-execute the shuffle+pack+join lineage from scratch
    out = shuffled.join(packed, on=shuffled.shuffle_rank == F.col("_sr")).drop("_sr").localCheckpoint(
        eager=False
    )

    agg = out.agg(
        F.sum("n_tokens").alias("tokens"),
        F.count_distinct("bucket", "pack_idx").alias("packs"),
    ).collect()[0]
    metrics["total_tokens"] = int(agg.tokens or 0)
    metrics["packs"] = int(agg.packs or 0)
    return out, metrics


def main():
    ap = argparse.ArgumentParser(description="Prepare a packed, ordered training mix")
    ap.add_argument("--corpus", required=True, help="corpus: parquet path or snapshot-table root")
    ap.add_argument("--output", required=True, help="output snapshot-table root")
    ap.add_argument("--eval-set", default=None, help="optional eval-set parquet for decontamination")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--target-rows", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--budget-tokens", type=int, default=2048)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    import os

    from dsm2dtm_spark.session import get_spark
    from dsm2dtm_spark.sources import SnapshotTable

    spark = get_spark("prepare-training-mix", cores=args.cores)
    if os.path.isdir(os.path.join(args.corpus, "meta")):
        corpus = SnapshotTable(args.corpus).read(spark)
    else:
        corpus = spark.read.parquet(args.corpus)
    eval_docs = spark.read.parquet(args.eval_set) if args.eval_set else None

    out, metrics = prepare_training_mix(
        spark,
        corpus,
        eval_docs=eval_docs,
        source_col=args.source_col,
        temperature=args.temperature,
        target_rows=args.target_rows,
        seed=args.seed,
        budget_tokens=args.budget_tokens,
        n_buckets=args.n_buckets,
        ngram=args.ngram,
    )
    snap = SnapshotTable(args.output).write_dataframe(
        out, summary={"op": "training-mix", "seed": args.seed, **{k: v for k, v in metrics.items() if k != "rates"}},
        partition_by=["bucket"],
    )
    print(json.dumps({"snapshot": snap.snapshot_id, **metrics}))
    spark.stop()


if __name__ == "__main__":
    main()
