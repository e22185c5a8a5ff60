"""spark-submit job: INCREMENTAL corpus ingest — the production loop a
training-data pipeline actually runs (a fresh crawl snapshot lands; it must
be curated against everything already committed, without reprocessing it).

Per batch:

    scan fresh batch → quality gate (token/stopword bounds)
        → within-batch exact dedup (md5 fingerprint, min-id wins)
        → [--eval-set] benchmark decontamination (distinct-gram broadcast)
        → incremental dedup vs the SignatureStore (fingerprint anti-join +
          banded equi-join + stored-signature Jaccard estimate — the
          committed corpus is NEVER re-shingled; operators/incremental.py)
        → atomic commits: survivors append to the corpus table, their
          signatures/bands append to the store, a JSON metrics line emits

    zip -qr engine.zip dsm2dtm_spark
    spark-submit --py-files engine.zip jobs/ingest_snapshot.py \
        --input /path/to/fresh.parquet --corpus /path/to/corpus_table \
        --store /path/to/sigstore [--eval-set /path/to/eval.parquet] \
        [--threshold 0.5] [--ngram 13] [--bucket-cap 20000] [--cores 32]

Exactly-once-ish semantics: a batch id (md5 of the resolved input path +
row count) is recorded in the corpus commit summary; re-running the SAME
batch against the same corpus is a no-op (the guard catches it before any
signing). Both commits are atomic snapshot-manifest operations, corpus
first, store second. A crash between them leaves rows committed but
unsigned — every run opens with a REPAIR step that anti-joins corpus ids
against store ids (two narrow scans) and re-signs exactly the unsigned
rows, so the window self-heals before any new batch is processed (and
the batch-id guard stays a pure no-op check).
"""

from __future__ import annotations

import argparse
import hashlib
import json


def repair_store(
    spark,
    corpus_table,
    store,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    method: str = "xxhash64",
) -> int:
    """Re-sign corpus rows that have no signature in the store (the
    crash-between-commits window, or a store lost to operator error):
    corpus ids anti-join store ids — two narrow scans — then
    ``sign_documents`` over ONLY the missing rows. Returns how many rows
    were repaired (0 on the happy path, where this costs one cheap count)."""
    from dsm2dtm_spark.operators.incremental import sign_documents

    if corpus_table.current_snapshot() is None:
        return 0
    corpus = corpus_table.read(spark)
    if store.is_empty():
        missing = corpus
    else:
        store.check_params(n_hashes, bands, 3, method)
        sig_ids = store.read_signatures(spark).select(id_col)
        missing = corpus.join(sig_ids, on=id_col, how="left_anti")
    missing = missing.localCheckpoint(eager=False)
    n = missing.count()
    if n:
        sigs = sign_documents(missing, text_col, id_col, n_hashes=n_hashes, method=method)
        store.append(sigs, bands=bands, summary={
            "op": "repair",
            "sig_params": {"n_hashes": n_hashes, "bands": bands, "shingle_n": 3, "method": method},
        })
    return n


def ingest_batch(
    spark,
    fresh,
    corpus_table,
    store,
    eval_docs=None,
    threshold: float = 0.5,
    ngram: int = 13,
    min_tokens: int = 3,
    max_stopword_ratio: float = 0.9,
    n_hashes: int = 16,
    bands: int = 4,
    method: str = "xxhash64",
    bucket_cap: int | None = None,
    batch_id: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """One incremental-ingest step. Returns (survivors DataFrame or None,
    stage-count dict). ``corpus_table``/``store`` mutate only when there is
    something to commit; an already-ingested ``batch_id`` short-circuits."""
    from pyspark.sql import functions as F

    from dsm2dtm_spark.functions.text import quality_features
    from dsm2dtm_spark.operators.dedup import exact_dedup
    from dsm2dtm_spark.operators.decontam import decontaminate
    from dsm2dtm_spark.operators.incremental import band_buckets, dedup_against, sign_documents

    # self-heal BEFORE the batch guard: a crash between the corpus and store
    # commits left rows committed-but-unsigned, and the guard would
    # otherwise short-circuit past them forever
    repaired = repair_store(
        spark, corpus_table, store, text_col=text_col, id_col=id_col,
        n_hashes=n_hashes, bands=bands, method=method,
    )

    cur = corpus_table.current_snapshot()
    seen = (cur.summary or {}).get("ingested_batches", []) if cur else []
    if batch_id and batch_id in seen:
        return None, {"skipped": "batch already ingested", "batch_id": batch_id, "repaired": repaired}

    counts = {"input": fresh.count(), "repaired": repaired}

    # each stage is lazily checkpointed and materialized by its own count,
    # so the chain executes ONCE — downstream consumers (dedup fresh side,
    # survivors join, both store writes) read the cached blocks instead of
    # re-running the quality/window/decontam lineage four more times
    q = quality_features(fresh, text_col=text_col)
    kept = q.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("stopword_ratio") <= max_stopword_ratio)
    ).select(*fresh.columns).localCheckpoint(eager=False)
    counts["after_quality"] = kept.count()

    kept = exact_dedup(kept, text_col=text_col, id_col=id_col).localCheckpoint(eager=False)
    counts["after_within_batch_exact"] = kept.count()

    if eval_docs is not None:
        kept = decontaminate(
            kept, eval_docs, n=ngram, text_col=text_col, id_col=id_col
        ).localCheckpoint(eager=False)
        counts["after_decontam"] = kept.count()

    sig_params = {"n_hashes": n_hashes, "bands": bands, "shingle_n": 3, "method": method}
    if store.is_empty():
        decisions = kept.select(F.col(id_col), F.lit("keep").alias("verdict"))
        keep_sigs = sign_documents(kept, text_col, id_col, n_hashes=n_hashes, method=method)
    else:
        store.check_params(**sig_params)
        decisions, keep_sigs = dedup_against(
            kept,
            store.read_signatures(spark),
            store.read_bands(spark),
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            n_hashes=n_hashes,
            bands=bands,
            method=method,
            bucket_cap=bucket_cap,
        )
        decisions = decisions.localCheckpoint(eager=True)
    verdicts = {r["verdict"]: r["n"] for r in decisions.groupBy("verdict").agg(F.count("*").alias("n")).collect()}
    counts["dropped_exact_vs_corpus"] = verdicts.get("exact", 0)
    counts["dropped_near_vs_corpus"] = verdicts.get("near", 0)
    counts["survivors"] = verdicts.get("keep", 0)
    survivors = kept.join(
        decisions.filter(F.col("verdict") == "keep").select(id_col), on=id_col, how="left_semi"
    )
    summary = {"op": "ingest", **counts}
    if batch_id:
        summary["ingested_batches"] = seen + [batch_id]
    if counts["survivors"]:
        # corpus first, store second: a crash between the two leaves rows
        # committed but unsigned — the batch guard makes the rerun a no-op,
        # and a LOST store append only risks duplicates being re-admitted
        # (conservative), never committed rows being double-dropped
        corpus_table.write_dataframe(survivors, summary=summary)
        store.append(keep_sigs, bands=bands, summary={"op": "ingest", "sig_params": sig_params})
    elif batch_id and corpus_table.current_snapshot() is not None:
        # record the batch even when nothing survives, so reruns short-circuit
        corpus_table.commit([], operation="append", summary={**summary, "op": "ingest-empty"})
    return survivors, counts


def main():
    ap = argparse.ArgumentParser(description="Incrementally ingest a fresh document batch")
    ap.add_argument("--input", required=True, help="fresh batch: parquet path or snapshot-table root")
    ap.add_argument("--corpus", required=True, help="committed-corpus snapshot-table root")
    ap.add_argument("--store", required=True, help="SignatureStore root")
    ap.add_argument("--eval-set", default=None, help="optional eval-set parquet for decontamination")
    ap.add_argument("--threshold", type=float, default=0.5, help="estimated-Jaccard near-dup threshold")
    ap.add_argument("--ngram", type=int, default=13, help="decontamination word n-gram size")
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--max-stopword-ratio", type=float, default=0.9)
    ap.add_argument("--method", choices=["xxhash64", "md5"], default="xxhash64")
    ap.add_argument("--bucket-cap", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    import os

    from dsm2dtm_spark.operators.incremental import SignatureStore
    from dsm2dtm_spark.session import get_spark
    from dsm2dtm_spark.sources import SnapshotTable

    spark = get_spark("ingest-snapshot", cores=args.cores)
    if os.path.isdir(os.path.join(args.input, "meta")):
        fresh = SnapshotTable(args.input).read(spark)
    else:
        fresh = spark.read.parquet(args.input)
    eval_docs = spark.read.parquet(args.eval_set) if args.eval_set else None

    batch_id = hashlib.md5(f"{os.path.abspath(args.input)}:{fresh.count()}".encode()).hexdigest()[:16]
    _, counts = ingest_batch(
        spark,
        fresh,
        SnapshotTable(args.corpus),
        SignatureStore(args.store),
        eval_docs=eval_docs,
        threshold=args.threshold,
        ngram=args.ngram,
        min_tokens=args.min_tokens,
        max_stopword_ratio=args.max_stopword_ratio,
        method=args.method,
        bucket_cap=args.bucket_cap,
        batch_id=batch_id,
    )
    print(json.dumps({"batch_id": batch_id, **counts}))
    spark.stop()


if __name__ == "__main__":
    main()
