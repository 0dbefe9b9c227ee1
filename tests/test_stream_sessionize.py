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


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the sessionizer fn
    without a streaming query."""

    hasTimedOut = False

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self._v, self.exists = None, False


def test_sessionizer_sorts_across_chunks():
    """applyInPandasWithState delivers a group's rows as MULTIPLE
    chunks with no cross-chunk ordering: the gap logic must sort ts
    globally, not per chunk.  Here chunk 1 carries the LATEST event;
    per-chunk sorting would see 50m, 0m, 10m in that order, never
    observe the 40-minute gap, and lump all 3 events into one session."""
    import pandas as pd

    from tool_documentsconverter_spark.streaming.sessionize_stream import (
        make_sessionizer,
    )

    fn = make_sessionizer(gap_seconds=1800)
    chunk1 = pd.DataFrame({"ts": [T0 + dt.timedelta(minutes=50)]})
    chunk2 = pd.DataFrame({"ts": [T0, T0 + dt.timedelta(minutes=10)]})
    out = pd.concat(list(fn(("conv-x",), iter([chunk1, chunk2]),
                            _FakeState())))
    rows = {(r.session_id, r.closed): r for r in out.itertuples()}
    closed = rows[(0, True)]
    assert closed.events == 2  # t0 + t0+10m closed by the 50m event
    assert closed.last_ts_epoch == int(
        (T0 + dt.timedelta(minutes=10)).timestamp())
    opened = rows[(1, False)]
    assert opened.events == 1
    assert opened.session_start_epoch == int(
        (T0 + dt.timedelta(minutes=50)).timestamp())
