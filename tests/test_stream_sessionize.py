"""Stateful streaming sessionization: state must survive across
micro-batches (the whole point of applyInPandasWithState) and the
session arithmetic must match the batch `sessionize` semantics."""

import datetime as dt
import os
import time

import pytest

from tool_documentsconverter_spark.streaming.sessionize_stream import (
    sessionize_stream,
)

UTC = dt.timezone.utc
T0 = dt.datetime(2026, 1, 1, 12, 0, 0, tzinfo=UTC)


def _write_batch(spark, src_dir: str, name: str, rows):
    # the file stream source lists FILES directly under the path, so
    # stage the parquet dir elsewhere and move its part file in flat
    import glob
    import shutil

    staging = f"{src_dir}/../staging_{name}"
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(f"{staging}/part-*.parquet")[0]
    shutil.move(part, f"{src_dir}/{name}.parquet")
    shutil.rmtree(staging)


def test_sessions_split_on_gap_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch file 1: two events 10 min apart (same session)
    _write_batch(spark, src, "b1", [
        ("conv-a", T0),
        ("conv-a", T0 + dt.timedelta(minutes=10)),
        ("conv-b", T0),
    ])
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    # batch file 2: conv-a returns after 40 min (> 30 min gap -> new
    # session); conv-b continues within its session
    _write_batch(spark, src, "b2", [
        ("conv-a", T0 + dt.timedelta(minutes=50)),
        ("conv-b", T0 + dt.timedelta(minutes=20)),
    ])

    stream = (
        spark.readStream.schema("conv_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()

    by_key = {}
    for r in rows:  # last update per (conv, session) wins
        by_key[(r.conv_id, r.session_id, r.closed)] = r

    # conv-a session 0 was CLOSED by the 50-min event with 2 events
    closed_a0 = by_key[("conv-a", 0, True)]
    assert closed_a0.events == 2
    assert closed_a0.session_start_epoch == int(T0.timestamp())
    # conv-a session 1 is open with 1 event — state crossed the batch
    open_a1 = by_key[("conv-a", 1, False)]
    assert open_a1.events == 1
    assert open_a1.session_start_epoch == int(
        (T0 + dt.timedelta(minutes=50)).timestamp())
    # conv-b stayed in one session, 2 events after batch 2
    open_b = by_key[("conv-b", 0, False)]
    assert open_b.events == 2
