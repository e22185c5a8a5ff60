"""Streaming twin of incremental ingest (streaming/ingest_dedup.py):
micro-batches run the same curation chain against the same corpus/store as
the batch job — streaming and batch dedup against EACH OTHER."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dsm2dtm_spark.operators.incremental import SignatureStore, ingest_batch
from dsm2dtm_spark.sources import SnapshotTable
from dsm2dtm_spark.streaming.ingest_dedup import streaming_doc_ingest


def _write_batch(inbox: str, name: str, rows) -> None:
    os.makedirs(inbox, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "stream"
    pdf["n_chars"] = pdf.text.str.len().astype("int32")
    pdf.to_parquet(os.path.join(inbox, name))


@pytest.fixture()
def env(tmp_path):
    return (
        str(tmp_path / "inbox"),
        SnapshotTable(str(tmp_path / "corpus")),
        SignatureStore(str(tmp_path / "store")),
        str(tmp_path / "ckpt"),
    )


class TestStreamingIngestDedup:
    def test_stream_dedups_across_microbatches_and_vs_batch(self, spark, env):
        inbox, corpus, store, ckpt = env
        _write_batch(inbox, "a.parquet", [
            (0, "the first streamed document about shuffle partitions and skew"),
            (1, "a second streamed document on broadcast joins and pushdown"),
        ])
        streaming_doc_ingest(spark, inbox, corpus, store, ckpt, max_files_per_trigger=1)
        assert corpus.read(spark).count() == 2
        assert store.read_signatures(spark).count() == 2

        # second file: one exact re-crawl of a streamed doc + one novel
        _write_batch(inbox, "b.parquet", [
            (10, "the first streamed document about shuffle partitions and skew"),
            (11, "an entirely new streamed document about watermark semantics"),
        ])
        streaming_doc_ingest(spark, inbox, corpus, store, ckpt, max_files_per_trigger=1)
        ids = sorted(r.doc_id for r in corpus.read(spark).collect())
        assert ids == [0, 1, 11]  # 10 dropped as exact vs the streamed corpus

        # a BATCH ingest now dedups against what the STREAM committed
        batch = spark.createDataFrame(pd.DataFrame(
            [(20, "an entirely new streamed document about watermark semantics"),
             (21, "one genuinely fresh batch document closing out the test")],
            columns=["doc_id", "text"],
        ))
        _, c = ingest_batch(spark, batch, corpus, store, batch_id="batch-1")
        assert c["dropped_exact_vs_corpus"] == 1 and c["survivors"] == 1
        assert sorted(r.doc_id for r in corpus.read(spark).collect()) == [0, 1, 11, 21]

    def test_fresh_checkpoint_does_not_collide_with_old_epochs(self, spark, env, tmp_path):
        """Epoch ids restart at 0 per checkpoint: a SECOND stream (new
        checkpoint dir) into the same corpus must ingest its first batch
        instead of short-circuiting on the first stream's epoch-0 id."""
        inbox, corpus, store, ckpt = env
        _write_batch(inbox, "a.parquet", [(0, "the very first streamed document with plenty of distinct words")])
        streaming_doc_ingest(spark, inbox, corpus, store, ckpt)
        assert corpus.read(spark).count() == 1

        inbox2 = str(tmp_path / "inbox2")
        _write_batch(inbox2, "z.parquet", [(50, "a wholly different second-stream document about other topics")])
        streaming_doc_ingest(spark, inbox2, corpus, store, str(tmp_path / "ckpt2"))
        assert corpus.read(spark).count() == 2  # NOT silently skipped

    def test_store_compaction_after_many_small_commits(self, spark, env):
        _, corpus, store, _ = env
        # genuinely distinct texts: near-identical templates would be
        # (correctly!) dropped as near-dups of earlier batches
        topics = [
            "glacier meltwater sediment transport in alpine catchment basins",
            "parquet footer statistics drive file level predicate pruning",
            "broadcast hash joins avoid shuffling the large fact relation",
            "watermarks bound state retention for late arriving event data",
            "morphological opening separates ground returns from canopy noise",
            "salting hot keys spreads skewed partitions across executors",
            "vectorized arrow batches amortize python interpreter overhead",
            "connected components label duplicate clusters by minimum id",
            "progressive filters grow window sizes with elevation thresholds",
            "checkpoint lineage truncation keeps iterative plans bounded",
            "inverted list probes trade recall against candidate volume",
            "atomic manifest commits make crashed writers invisible",
        ]
        for i in range(4):
            batch = spark.createDataFrame(pd.DataFrame(
                [(100 * i + j, topics[3 * i + j]) for j in range(3)],
                columns=["doc_id", "text"],
            ))
            ingest_batch(spark, batch, corpus, store, batch_id=f"b{i}")
        n_files_before = len(store.bands.current_snapshot().files)
        res = store.compact(spark)
        assert res["signatures"] >= 2 and res["bands"] >= 2
        assert len(store.bands.current_snapshot().files) < n_files_before
        # contents unchanged
        assert store.read_signatures(spark).count() == 12
        assert store.read_bands(spark).count() == 12 * 4


class TestStreamingWithBucketedStore:
    def test_stream_over_bucketed_store_and_batch_interop(self, spark, tmp_path):
        """The streaming twin composes with the bucketed layout unchanged:
        ingest_batch resolves the shuffle-join strategy from the store
        class, and micro-batches + a later batch ingest dedup against the
        same hive-bucketed state."""
        from dsm2dtm_spark.operators.incremental import BucketedSignatureStore

        inbox = str(tmp_path / "inbox")
        corpus = SnapshotTable(str(tmp_path / "corpus"))
        store = BucketedSignatureStore(str(tmp_path / "store"), n_buckets=4)
        ckpt = str(tmp_path / "ckpt")
        _write_batch(inbox, "a.parquet", [
            (0, "the first streamed document about shuffle partitions and skew"),
            (1, "a second streamed document on broadcast joins and pushdown"),
        ])
        streaming_doc_ingest(spark, inbox, corpus, store, ckpt, max_files_per_trigger=1)
        assert store.read_signatures(spark).count() == 2
        _write_batch(inbox, "b.parquet", [
            (10, "the first streamed document about shuffle partitions and skew"),
            (11, "an entirely new streamed document about watermark semantics"),
        ])
        streaming_doc_ingest(spark, inbox, corpus, store, ckpt, max_files_per_trigger=1)
        assert sorted(r.doc_id for r in corpus.read(spark).collect()) == [0, 1, 11]
        # batch ingest against the stream's bucketed state
        batch = spark.createDataFrame(pd.DataFrame(
            [(20, "an entirely new streamed document about watermark semantics"),
             (21, "one genuinely fresh batch document closing out the test")],
            columns=["doc_id", "text"]))
        _, counts = ingest_batch(spark, batch, corpus, store, batch_id="bx")
        assert counts["dropped_exact_vs_corpus"] == 1 and counts["survivors"] == 1
        assert sorted(r.doc_id for r in corpus.read(spark).collect()) == [0, 1, 11, 21]
