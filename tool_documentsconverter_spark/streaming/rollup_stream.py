"""Watermarked windowed aggregation — the streaming twin of the batch
``events_rollup`` query (hypertable-style continuous aggregate).

The reference is strictly batch (SURVEY.md §2.9); this is the
standard Structured Streaming continuous-aggregate surface a
transcript/event corpus needs at scale:

  readStream(parquet dir) -> withWatermark(ts) -> groupBy(window(ts),
  event_type).agg(...) -> append-mode sink

Semantics under append mode (the scale-correct output mode — each
window row is emitted exactly once, when it can no longer change):

 - a (window, event_type) row is emitted only after the watermark
   passes the window end: downstream consumers never see a partial
   aggregate being revised;
 - events arriving later than ``watermark_delay`` behind the max seen
   event time are DROPPED from already-closed windows (bounded state:
   the store holds only open windows, never the full history);
 - windows still open when an availableNow run exhausts the input are
   retained in the checkpointed state store and emit on the next run —
   catch-up-then-stop incremental semantics, like stream_extract.

State per key = one partial aggregate row (count/sum/min/max are all
merge-able), so state size is O(open windows x event types) — constant
in the event count at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def windowed_rollup(stream: DataFrame, window: str = "1 hour",
                    watermark_delay: str = "30 minutes") -> DataFrame:
    """Per-(time window, event_type) rollup with the same aggregate
    surface as the batch ``events_rollup`` query, watermarked so the
    state store stays bounded and append mode can finalize windows."""
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value", "min_value", "max_value",
        )
    )


def run_stream_rollup(spark: SparkSession, input_dir: str,
                      checkpoint_dir: str, output_dir: str,
                      window: str = "1 hour",
                      watermark_delay: str = "30 minutes",
                      max_files_per_trigger: int = 1):
    """availableNow run writing finalized windows to a parquet table
    via foreachBatch (the memory sink cannot recover from a
    checkpoint, so it cannot express the catch-up-then-stop restart
    this operator exists for).

    foreachBatch alone is AT-LEAST-ONCE: a crash between the sink
    write and the checkpoint commit replays the batch on restart.  The
    sink is therefore made idempotent by keying each micro-batch's
    output on its ``batch_id`` (a ``batch_id=N`` partition directory,
    written with overwrite) — a replayed batch rewrites its own
    directory instead of appending duplicates, which upgrades the end
    result to effective exactly-once.  Combined with append-mode
    emission (each finalized window leaves the aggregation exactly
    once), the directory IS the continuous aggregate table.  Returns
    the StreamingQuery; caller awaits termination and reads
    ``spark.read.parquet(output_dir)`` (the extra ``batch_id``
    partition column is bookkeeping and can be dropped)."""
    rolled = windowed_rollup(
        read_event_stream(spark, input_dir, max_files_per_trigger),
        window, watermark_delay,
    )

    def _sink(batch_df, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{output_dir}/batch_id={batch_id}"))

    return (
        rolled.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
