"""Watermarked windowed rollup (streaming/rollup_stream.py): append
mode must emit a window exactly once after the watermark closes it,
drop events later than the watermark delay, and hold still-open
windows in checkpointed state across availableNow runs."""

import datetime as dt
import glob
import os
import shutil
import time

UTC = dt.timezone.utc
T0 = dt.datetime(2026, 1, 1, 0, 0, 0, tzinfo=UTC)


def _write_batch(spark, src_dir: str, name: str, rows):
    # the file stream source lists FILES directly under the path, so
    # stage the parquet dir elsewhere and move its part file in flat
    staging = f"{src_dir}/../staging_{name}"
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.move(part, f"{src_dir}/{name}.parquet")
    shutil.rmtree(staging)


def _ev(i, minutes, etype="click", value=1.0):
    return (i, T0 + dt.timedelta(minutes=minutes), 1, etype, value, "{}")


def test_windows_finalize_once_and_late_rows_drop(spark, tmp_path):
    """Two availableNow runs over one checkpoint: the watermark is
    persisted in the commit log, so run B restarts at run A's final
    watermark — which makes the late-drop and exactly-once-emission
    assertions deterministic regardless of how the file source batches
    the input within a run."""
    from tool_documentsconverter_spark.streaming.rollup_stream import (
        run_stream_rollup,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run A input: hour-0 has 2 clicks, hour-1 has 1 click, and one
    # hour-3 event that advances max event time to 03:00 -> the run
    # ends with watermark 02:30, closing (emitting) hours 0-2 while
    # hour 3 stays open in the state store
    _write_batch(spark, src, "b1", [
        _ev(1, 5), _ev(2, 25), _ev(3, 70), _ev(4, 180),
    ])
    out = str(tmp_path / "out")
    q = run_stream_rollup(spark, src, ckpt, out,
                          window="1 hour", watermark_delay="30 minutes")
    q.awaitTermination(120)
    rows = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.read.parquet(out).collect()
    }

    def _naive(hour):
        return dt.datetime(2026, 1, 1, hour, 0, 0)

    assert rows[(_naive(0), "click")] == 2
    assert rows[(_naive(1), "click")] == 1
    # hour-3 window is still OPEN (watermark 02:30 < 04:00): not emitted
    assert (_naive(3), "click") not in rows

    # run B input: a LATE hour-0 event — late because the RESTORED
    # watermark (02:30) is past its window END (01:00); merely being
    # behind max event time would be in-order enough — plus a 05:00
    # event that closes hour 3 out of the checkpointed state
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    _write_batch(spark, src, "b2", [_ev(5, 10), _ev(6, 300)])
    q2 = run_stream_rollup(spark, src, ckpt, out,
                           window="1 hour", watermark_delay="30 minutes")
    q2.awaitTermination(120)
    all_rows = spark.read.parquet(out).collect()
    by_key = {}
    for r in all_rows:
        by_key.setdefault((r.window_start, r.event_type), []).append(r.n_events)
    # hour-3 finalizes from state carried across runs (catch-up)
    assert by_key[(_naive(3), "click")] == [1]
    # exactly-once emission AND the late row was DROPPED: were it
    # accepted it would re-open the expired hour-0 window and append a
    # second spurious (hour-0, 1) row in run B
    assert by_key[(_naive(0), "click")] == [2]
    assert by_key[(_naive(1), "click")] == [1]


def test_closed_windows_match_batch_twin(spark, tmp_path):
    """For windows the watermark has closed, the streaming aggregate
    must equal the plain batch groupBy over the same files (excluding
    dropped-late rows, of which this fixture has none)."""
    from pyspark.sql import functions as F

    from tool_documentsconverter_spark.streaming.rollup_stream import (
        run_stream_rollup,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_batch(spark, src, "b1", [
        _ev(1, 5, "click", 2.5), _ev(2, 20, "view", 1.0),
        _ev(3, 40, "click", 4.0), _ev(4, 70, "view", 3.0),
    ])
    time.sleep(1.1)
    _write_batch(spark, src, "b2", [_ev(5, 600)])  # closes everything

    out = str(tmp_path / "out")
    q = run_stream_rollup(spark, src, ckpt, out,
                          window="1 hour", watermark_delay="30 minutes")
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value,
                                         r.min_value, r.max_value)
        for r in spark.read.parquet(out).collect()
        if r.window_start < dt.datetime(2026, 1, 1, 9, 0, 0)
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value,
                                         r.min_value, r.max_value)
        for r in (
            spark.read.parquet(src)
            .where(F.col("ts") < "2026-01-01 09:00:00")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.round(F.min("value"), 4).alias("min_value"),
                 F.round(F.max("value"), 4).alias("max_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value", "min_value", "max_value")
            .collect()
        )
    }
    assert got == batch
