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
                       checkpoint_dir: str, available_now: bool = True):
    """Incremental extraction: each micro-batch runs the identical
    Arrow extraction stage and appends to the output table.  Returns
    the StreamingQuery (caller awaits termination)."""
    stream = read_transcript_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(batch_df, hint_col="fmt_hint")
        out.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
