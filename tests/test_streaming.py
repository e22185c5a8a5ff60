"""Structured-Streaming ingest tests: file-stream → DTM → snapshot commits,
and idempotent replay of micro-batches."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dsm2dtm_spark import synth
from dsm2dtm_spark.sources import SnapshotTable
from dsm2dtm_spark.streaming import streaming_dtm_ingest


@pytest.fixture()
def inbox(tmp_path):
    d = tmp_path / "inbox"
    d.mkdir()
    pdf = synth.image_table(10, seed=21, sizes=(50,)).drop(columns=["scenario"])
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:6], preserve_index=False), str(d / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(pdf.iloc[6:], preserve_index=False), str(d / "b.parquet"))
    return d, pdf


def test_stream_drains_inbox_and_commits(spark, tmp_path, inbox):
    d, pdf = inbox
    out = SnapshotTable(str(tmp_path / "out"))
    streaming_dtm_ingest(spark, str(d), out, str(tmp_path / "ckpt"), available_now=True)
    got = out.read(spark)
    assert got.count() == 10
    assert got.select("image_id").distinct().count() == 10
    assert all(s.summary.get("op") == "stream-dtm" for s in out.snapshots())


def test_new_files_processed_incrementally(spark, tmp_path, inbox):
    d, pdf = inbox
    out = SnapshotTable(str(tmp_path / "out"))
    ck = str(tmp_path / "ckpt")
    streaming_dtm_ingest(spark, str(d), out, ck, available_now=True)
    n_snaps = len(out.snapshots())
    # drop one more file into the inbox; rerun with the same checkpoint
    more = synth.image_table(14, seed=21, sizes=(50,)).drop(columns=["scenario"]).iloc[10:]
    pq.write_table(pa.Table.from_pandas(more, preserve_index=False), str(os.path.join(d, "c.parquet")))
    streaming_dtm_ingest(spark, str(d), out, ck, available_now=True)
    assert out.read(spark).count() == 14
    assert len(out.snapshots()) > n_snaps
    # draining again with nothing new commits nothing
    streaming_dtm_ingest(spark, str(d), out, ck, available_now=True)
    assert out.read(spark).count() == 14


class TestStatefulDedup:
    def test_first_occurrence_per_phash_across_batches(self, spark, tmp_path):
        import pandas as pd
        from dsm2dtm_spark.streaming.dedup_state import streaming_phash_dedup

        d = tmp_path / "inbox2"
        d.mkdir()
        pdf = synth.image_table(12, seed=33, sizes=(50,), dup_fraction=0.0).drop(columns=["scenario"])
        # plant duplicates: rows 6..11 reuse the phash of rows 0..5
        pdf.loc[6:, "phash"] = pdf.phash.iloc[:6].to_numpy()
        pq.write_table(pa.Table.from_pandas(pdf.iloc[:6], preserve_index=False), str(d / "a.parquet"))
        ck = str(tmp_path / "ck2")
        outd = str(tmp_path / "dedup_out")
        out1 = streaming_phash_dedup(spark, str(d), ck, outd).collect()
        n_distinct = pdf.iloc[:6].phash.nunique()  # scenes may collide naturally
        assert len(out1) == n_distinct
        assert len({r.phash for r in out1}) == n_distinct
        # second batch: all planted duplicates -> nothing new emitted
        # (per-phash state persisted through the checkpoint)
        pq.write_table(pa.Table.from_pandas(pdf.iloc[6:], preserve_index=False), str(d / "b.parquet"))
        out2 = streaming_phash_dedup(spark, str(d), ck, outd).collect()
        assert {r.image_id for r in out2} == {r.image_id for r in out1}
