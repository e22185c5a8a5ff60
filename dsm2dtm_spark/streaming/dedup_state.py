"""Custom stateful streaming operator: cross-micro-batch exact dedup by
perceptual hash, via ``applyInPandasWithState`` (the pattern the task brief
names for custom stateful operators).

A continuous image ingest sees the same asset re-crawled across days; the
first occurrence should flow through, later ones be dropped. Grouping the
stream by ``phash`` and keeping one boolean per group in the state store does
exactly that — state survives micro-batches via the checkpoint. End-to-end delivery
is exactly-once as long as the sink is idempotent: foreachBatch alone is
at-least-once (a crash between the sink write and the checkpoint commit
replays the batch), so the sink below keys each write by batch_id and
overwrites — a replayed batch lands in the same directory instead of
duplicating rows.
"""

from __future__ import annotations

import os

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("phash", LongType()),
        StructField("image_id", StringType()),
        StructField("caption", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _first_occurrence(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen = state.get[0] if state.exists else 0
    out = []
    for pdf in pdfs:
        if seen == 0 and len(pdf):
            first = pdf.sort_values("image_id").iloc[:1]
            out.append(pd.DataFrame({"phash": [key[0]], "image_id": first.image_id.values,
                                     "caption": first.caption.values}))
        seen += len(pdf)
    state.update((seen,))
    for o in out:
        yield o


def streaming_phash_dedup(spark, inbox_dir: str, checkpoint_dir: str, out_dir: str, available_now: bool = True):
    """File-stream the image table, emit only the first row ever seen per
    phash — across micro-batches AND restarts (per-group state lives in the
    checkpointed state store). Emitted rows land under ``out_dir`` parquet
    via an idempotent foreachBatch sink: each micro-batch overwrites its own
    ``batch_id=N`` partition, so a replay after a crash between sink write
    and checkpoint commit rewrites the same data instead of duplicating it.
    Returns the accumulated output DataFrame in availableNow mode."""
    from dsm2dtm_spark.streaming.ingest import IMAGE_SCHEMA_DDL

    stream = spark.readStream.schema(IMAGE_SCHEMA_DDL).parquet(inbox_dir).select("phash", "image_id", "caption")
    deduped = stream.groupBy("phash").applyInPandasWithState(
        _first_occurrence,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df, batch_id: int):
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch_id={batch_id}"))

    writer = (
        deduped.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return spark.read.parquet(out_dir).drop("batch_id")
    return writer.start()
