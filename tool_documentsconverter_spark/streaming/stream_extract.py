"""Structured Streaming variant of the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.9) and the north-rule
resume story is the bucket/lineage anti-join, NOT streaming — but an
incremental ingest surface is table stakes for a transcript corpus
that grows continuously.  This module runs the SAME extraction stage
as a stream:

  readStream(parquet dir) -> mapInArrow extraction -> writeStream
  (foreachBatch -> parquet append), Trigger.AvailableNow for
  catch-up-then-stop semantics, checkpointLocation for exactly-once
  progress tracking (Spark's own WAL replaces the lineage table here).

Late data/watermarks are irrelevant to per-turn extraction (each turn
is independent); the watermarked windowed-aggregation surface lives in
rollup_stream.py (streaming twin of the batch events_rollup query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import extract
from ..schemas import TRANSCRIPTS


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           with_hint: bool = True) -> DataFrame:
    schema = TRANSCRIPTS
    if with_hint:
        from pyspark.sql import types as T

        schema = T.StructType(
            TRANSCRIPTS.fields + [T.StructField("fmt_hint", T.StringType(), True)]
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str, available_now: bool = True,
                       batch_hook=None):
    """Incremental extraction: each micro-batch runs the identical
    Arrow extraction stage and lands in the output table.  Returns
    the StreamingQuery (caller awaits termination).

    EXACTLY-ONCE: foreachBatch is at-least-once by contract — a crash
    after the sink write but before the checkpoint commit replays the
    batch on restart — so the sink must be idempotent.  Each batch
    OVERWRITES its own ``batch_id=N`` partition directory (the file
    source is deterministic, so a replayed batch id carries the same
    rows): a replay rewrites identical files instead of appending
    duplicates.  ``mode("append")`` here would silently double rows
    under crash-restart — pinned by
    tests/test_stream_failure.py::test_crash_between_write_and_commit.

    ``batch_hook(batch_id)`` is a test-only failure-injection point,
    invoked AFTER the sink write and BEFORE foreachBatch returns
    (i.e. before Spark commits the batch to the checkpoint) — raising
    from it simulates dying in the at-least-once window."""
    stream = read_transcript_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(batch_df, hint_col="fmt_hint")
        out.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}")
        if batch_hook is not None:
            batch_hook(batch_id)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
