"""Fixed StructType schemas, enforced on read (SURVEY.md §1.2: the
reference's schema system is dynamic/suffix-only; the rebuild declares
schemas once, here)."""

from __future__ import annotations

from pyspark.sql import types as T

# Input table per BASELINE.json input_hint:
# (conv_id:string, turn_idx:int32, role:string, text:string,
#  tool:string, ts:timestamp)
TRANSCRIPTS = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

# Result columns appended by the extraction stage — mirror of
# TaskResult (reference doc_to_md/main.py:48-56): status in
# {ok, skipped, failed}, message, seconds; fmt records the sniffed
# format (the rebuild's upgrade of suffix dispatch).
EXTRACTED = T.StructType(
    TRANSCRIPTS.fields
    + [
        T.StructField("fmt", T.StringType(), True),
        T.StructField("md", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("seconds", T.DoubleType(), True),
        T.StructField("bucket", T.IntegerType(), False),
    ]
)

# Per-partition lineage/checkpoint rows (north_star: partition id,
# input snapshot, rows in/out, extraction error counts) — the
# resume-from-checkpoint anti-join key is `bucket`.
LINEAGE = T.StructType([
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("input_snapshot", T.StringType(), False),
    T.StructField("rows_in", T.LongType(), False),
    T.StructField("rows_out", T.LongType(), False),
    T.StructField("error_count", T.LongType(), False),
    T.StructField("committed_at", T.TimestampType(), False),
])
