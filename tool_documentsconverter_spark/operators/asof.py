"""As-of join — a custom operator Spark's built-ins don't offer.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (the time-series "last known
value" join; DuckDB/kdb call it ASOF JOIN).

Distributed shape: tag the two inputs, union them, and run ONE window
per key ordered by (ts, side) carrying the last non-null right payload
forward; left rows then read their match from the running state.  This
is a single hash shuffle on the key + a within-partition sort — no
range cross-join, no per-key driver loop, and skew follows the same
rules as any keyed window (salt upstream if one key dominates).
Ties (right.ts == left.ts) match, because rights sort before lefts at
equal timestamps.  Among MULTIPLE right rows sharing the same
(key, ts), the greatest payload struct wins (the payload participates
in the window ordering) — a deterministic tie-break, where leaving the
order unspecified would make the matched row vary run-to-run with
shuffle arrival order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt) -> bool:
    """Spark cannot sort MapType (at any nesting depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_cols: Sequence[str],
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every column of `left`, plus `prefix`-renamed
    `right_cols` from the latest right row at-or-before the left row's
    `ts` (NULL when no such row exists)."""
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key), F.col(ts),
        payload.alias("_asof_payload"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields if f.name not in (key, ts)],
    )
    l = left.select(
        F.col(key), F.col(ts),
        F.lit(None).cast(r.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
        F.lit(1).alias("_asof_side"),
        *[c for c in left.columns if c not in (key, ts)],
    )
    # payload last in the ordering: among right rows tied on (key, ts)
    # the greatest payload sorts last, so F.last picks it — without
    # this the match is nondeterministic under shuffle.  Left rows all
    # carry NULL payload (sorted first within their side, skipped by
    # ignorenulls), so their relative order never changes the result.
    # MapType (at any nesting) is not orderable in Spark, so payloads
    # containing maps tie-break on md5(to_json(payload)) instead —
    # arbitrary but deterministic, which is all a tie-break needs.
    payload_type = r.schema["_asof_payload"].dataType
    tie = (
        F.col("_asof_payload")
        if _orderable(payload_type)
        else F.md5(F.to_json(F.col("_asof_payload")))
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_asof_side").asc(),
                 tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        l.unionByName(r)
        .withColumn("_asof_match",
                    F.last("_asof_payload", ignorenulls=True).over(w))
        .where(F.col("_asof_side") == 1)
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col("_asof_match").getField(c).alias(f"{prefix}{c}")
        for c in right_cols
    ]
    return joined.select(*out_cols)
