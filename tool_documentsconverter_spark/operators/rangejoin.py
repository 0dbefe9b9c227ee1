"""Range (interval-containment) join — a custom operator Spark lacks.

A naive interval join (``points.ts BETWEEN intervals.start AND
intervals.end``) is a theta-join: Spark can only plan it as a
broadcast-nested-loop or a cartesian product, both O(n*m) — dead at
100 TB.  The scale shape used here is the classic *bucketed* range
join (the same trick Databricks' range-join optimization and
KDB/TimescaleDB interval indexes use):

 1. chop the time axis into fixed ``bucket_seconds`` buckets;
 2. each interval row is exploded to every bucket it overlaps
    (``ceil(len/bucket) + 1`` rows — bounded when bucket_seconds is
    sized near the typical interval length);
 3. each point row maps to exactly ONE bucket;
 4. equi-join on (key, bucket) — shuffled, AQE-skew-splittable, never
    a cross product — then the precise ``BETWEEN`` filter runs on the
    few same-bucket candidates.

Because the point side lands in exactly one bucket, a (interval,
point) pair can match in at most one bucket — the join needs NO
de-duplication pass afterwards (the usual hidden cost of explode
joins).

The interval side carries only its key + bounds through the explode;
wide payload columns should be joined back by id afterwards if needed
(same discipline as dedup.embedding_cosine_dups keeping vectors out of
the banded shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "_rj_bucket"


def _epoch(df: DataFrame, col: str):
    # Bucket index needs a MONOTONIC map from the timestamp to a
    # number, and which map is monotonic depends on the TYPE:
    #  - TIMESTAMP (LTZ) is an instant: cast to double (true epoch)
    #    is monotonic; wall-clock arithmetic would run backwards
    #    across a DST fall-back fold.
    #  - TIMESTAMP_NTZ is a wall clock: day/hour/minute/second
    #    arithmetic is monotonic; interpreting it in a DST session
    #    timezone (the cast path) runs backwards across the
    #    spring-forward gap — and the cast to double is not even
    #    allowed for NTZ.
    # Second-level resolution on the NTZ path is fine for bucketing:
    # the precise BETWEEN filter runs on the original columns after
    # the equi-join.
    from pyspark.sql import types as T

    c = F.col(col)
    if isinstance(df.schema[col].dataType, T.TimestampType):
        return c.cast("double")
    return (
        F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("double")
        * 86400.0
        + F.hour(c) * 3600.0 + F.minute(c) * 60.0 + F.second(c)
    )


def range_join(intervals: DataFrame, points: DataFrame, key: str,
               start_col: str, end_col: str, ts_col: str,
               bucket_seconds: int = 3600,
               max_buckets_per_interval: int = 100_000,
               on_oversized: str = "error") -> DataFrame:
    """Inner-join every `points` row onto every `intervals` row of the
    same `key` whose [start_col, end_col] (both INCLUSIVE) contains
    `ts_col`.  All three bound columns must be timestamps of the SAME
    type (TIMESTAMP or TIMESTAMP_NTZ — the bucket map differs by
    type, so mixing would misalign the sides); the bucket index
    quantizes to whole seconds, which only needs monotonicity because
    the precise containment predicate runs on the original columns.

    Column names of the two inputs must not collide except `key`
    (rename before calling — this operator never guesses a prefix).

    The interval-side explode is guarded by `max_buckets_per_interval`:
    a single corrupt/outlier interval (e.g. end = 9999-12-31 with
    bucket_seconds=300) would otherwise generate hundreds of millions
    of bucket rows, and Spark's sequence() hard-errors past ~2^31
    elements — one bad row killing the whole job.  `on_oversized`
    picks the degradation: "error" (default) raises a diagnosable
    error naming the offending key, "drop" filters oversized
    intervals out of the join (isolating the bad rows).
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    if on_oversized not in ("error", "drop"):
        raise ValueError("on_oversized must be 'error' or 'drop'")
    overlap = set(intervals.columns) & set(points.columns) - {key}
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")
    ts_types = {
        type(intervals.schema[start_col].dataType),
        type(intervals.schema[end_col].dataType),
        type(points.schema[ts_col].dataType),
    }
    if len(ts_types) != 1:
        raise ValueError(
            f"all three bound columns must share one timestamp type, "
            f"got {[t.__name__ for t in sorted(ts_types, key=str)]}"
        )
    b = F.lit(float(bucket_seconds))
    b0 = F.floor(_epoch(intervals, start_col) / b)
    b1 = F.floor(_epoch(intervals, end_col) / b)
    span = b1 - b0 + F.lit(1)
    oversized = span > F.lit(max_buckets_per_interval)
    if on_oversized == "error":
        # The guard is woven into the sequence END bound (not a
        # separate projected-then-dropped column, which Catalyst would
        # prune away without ever evaluating the raise_error).
        end_bound = F.when(
            oversized,
            F.raise_error(F.concat(
                F.lit(
                    f"range_join: interval spans more than "
                    f"{max_buckets_per_interval} buckets "
                    f"(bucket_seconds={bucket_seconds}) at {key}="
                ),
                F.col(key).cast("string"),
                F.lit(" — corrupt bounds? raise bucket_seconds/"
                      "max_buckets_per_interval or use "
                      "on_oversized='drop'"),
            )).cast("bigint"),
        ).otherwise(b1)
        guarded = intervals
    else:
        end_bound = b1
        guarded = intervals.where(~oversized)
    li = guarded.withColumn(_B, F.explode(F.sequence(b0, end_bound)))
    rp = points.withColumn(_B, F.floor(_epoch(points, ts_col) / b))
    return (
        li.join(rp, on=[key, _B])
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop(_B)
    )
