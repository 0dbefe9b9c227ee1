"""Bucketed range join (operators/rangejoin.py): the equi-join-on-
(key, time-bucket) implementation must match the naive BETWEEN
semantics exactly — inclusive bounds, intervals spanning many buckets,
no duplicate pairs from the explode (each point maps to ONE bucket)."""

import datetime as dt

import pytest

from tool_documentsconverter_spark.operators.rangejoin import range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


@pytest.fixture(scope="module")
def frames(spark):
    intervals = spark.createDataFrame(
        [
            (1, 10, _ts(0), _ts(100)),       # same bucket (60s buckets: 0-1)
            (2, 10, _ts(30), _ts(330)),      # spans 6 buckets
            (3, 20, _ts(0), _ts(100)),       # other key, same times as #1
            (4, 10, _ts(500), _ts(510)),     # matches nothing
        ],
        "iv_id int, k int, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [
            (100, 10, _ts(0)),               # == start of #1: inclusive
            (101, 10, _ts(100)),             # == end of #1: inclusive
            (102, 10, _ts(100, 1)),          # 1us past end of #1; inside #2
            (103, 10, _ts(250)),             # inside #2 only, far bucket
            (104, 20, _ts(50)),              # key 20 -> #3 only
            (105, 30, _ts(50)),              # key with no interval
        ],
        "pt_id int, k int, ts timestamp",
    )
    return intervals, points


def _pairs(intervals, points, bucket_seconds):
    out = range_join(intervals, points, key="k", start_col="start",
                     end_col="end", ts_col="ts",
                     bucket_seconds=bucket_seconds)
    return sorted((r.iv_id, r.pt_id) for r in out.collect())


EXPECTED = [(1, 100), (1, 101), (2, 101), (2, 102), (2, 103), (3, 104)]


def test_matches_naive_between_semantics(frames):
    assert _pairs(*frames, bucket_seconds=60) == EXPECTED


def test_bucket_size_never_changes_results(frames):
    # correctness must not depend on the tuning knob
    for b in (1, 7, 1000):
        assert _pairs(*frames, bucket_seconds=b) == EXPECTED


def test_no_duplicate_pairs_from_explode(frames):
    intervals, points = frames
    out = range_join(intervals, points, key="k", start_col="start",
                     end_col="end", ts_col="ts", bucket_seconds=10)
    rows = [(r.iv_id, r.pt_id) for r in out.collect()]
    assert len(rows) == len(set(rows))


def test_ntz_bucketing_survives_dst_spring_forward_gap(spark):
    """The bucket index must be MONOTONIC in the timestamp value.  For
    NTZ columns, interpreting the wall clock in a DST session timezone
    (the old cast path) maps the 2024-03-10 02:00-03:00 US gap
    non-monotonically, so an interval spanning the gap exploded to a
    backwards (empty) bucket range and dropped its matches; the
    wall-clock arithmetic path is immune."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        gap = dt.datetime(2024, 3, 10, 2, 45, 0)
        intervals = spark.createDataFrame(
            [(1, 10, gap, gap + dt.timedelta(minutes=30))],
            "iv_id int, k int, start timestamp_ntz, end timestamp_ntz",
        )
        points = spark.createDataFrame(
            [(100, 10, gap + dt.timedelta(minutes=15))],
            "pt_id int, k int, ts timestamp_ntz",
        )
        out = range_join(intervals, points, key="k", start_col="start",
                         end_col="end", ts_col="ts", bucket_seconds=300)
        assert [(r.iv_id, r.pt_id) for r in out.collect()] == [(1, 100)]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_ltz_bucketing_survives_dst_fall_back_fold(spark):
    """For TIMESTAMP (LTZ) columns the complementary hazard is the
    fall-back fold: wall-clock arithmetic would run BACKWARDS across
    2024-11-03 02:00->01:00 US, so LTZ must bucket on the true epoch.
    Interval 05:50Z..06:10Z (wall 01:50 EDT -> 01:10 EST, 'backwards'
    on the wall clock) must still match a point at 06:00Z inside it."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        utc = dt.timezone.utc
        s = dt.datetime(2024, 11, 3, 5, 50, 0, tzinfo=utc)
        intervals = spark.createDataFrame(
            [(1, 10, s, s + dt.timedelta(minutes=20))],
            "iv_id int, k int, start timestamp, end timestamp",
        )
        points = spark.createDataFrame(
            [(100, 10, s + dt.timedelta(minutes=10))],
            "pt_id int, k int, ts timestamp",
        )
        out = range_join(intervals, points, key="k", start_col="start",
                         end_col="end", ts_col="ts", bucket_seconds=300)
        assert [(r.iv_id, r.pt_id) for r in out.collect()] == [(1, 100)]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_hot_key_bucket_skew_completes_exactly(spark):
    """One key owning thousands of points in a single bucket is the
    skew case AQE can split because the join is a plain equi-join;
    verify counts stay exact under it (explode emits no duplicates
    and the precise filter drops nothing it shouldn't)."""
    n = 5000
    intervals = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(3600))],
        "iv_id int, k int, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [(i, 10, _ts(i % 3600)) for i in range(n)],
        "pt_id int, k int, ts timestamp",
    )
    out = range_join(intervals, points, key="k", start_col="start",
                     end_col="end", ts_col="ts", bucket_seconds=3600)
    assert out.count() == n


def test_mixed_timestamp_types_rejected(frames):
    intervals, points = frames
    pts_ntz = points.selectExpr("pt_id", "k",
                                "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    with pytest.raises(ValueError, match="timestamp type"):
        range_join(intervals, pts_ntz, key="k", start_col="start",
                   end_col="end", ts_col="ts")


def test_column_collision_rejected(frames):
    intervals, points = frames
    with pytest.raises(ValueError, match="collision"):
        range_join(intervals, points.withColumnRenamed("ts", "start"),
                   key="k", start_col="start", end_col="end",
                   ts_col="start")


def test_nonpositive_bucket_rejected(frames):
    intervals, points = frames
    with pytest.raises(ValueError, match="bucket_seconds"):
        range_join(intervals, points, key="k", start_col="start",
                   end_col="end", ts_col="ts", bucket_seconds=0)


def test_oversized_interval_errors_with_diagnosable_message(spark):
    # ADVICE r3: one corrupt interval (end=9999-12-31, small buckets)
    # used to explode to ~2^31 sequence elements and kill the job with
    # an opaque Spark error.  Default mode now names the offending key.
    intervals = spark.createDataFrame(
        [(1, 10, _ts(0), dt.datetime(9999, 12, 31))],
        "iv_id int, k int, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [(100, 10, _ts(50))], "pt_id int, k int, ts timestamp")
    out = range_join(intervals, points, key="k", start_col="start",
                     end_col="end", ts_col="ts", bucket_seconds=300,
                     max_buckets_per_interval=1000)
    with pytest.raises(Exception, match="range_join: interval spans"):
        out.collect()


def test_oversized_interval_drop_mode_isolates_bad_row(spark):
    intervals = spark.createDataFrame(
        [
            (1, 10, _ts(0), _ts(100)),                    # sane
            (2, 10, _ts(0), dt.datetime(9999, 12, 31)),   # corrupt
        ],
        "iv_id int, k int, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [(100, 10, _ts(50))], "pt_id int, k int, ts timestamp")
    out = range_join(intervals, points, key="k", start_col="start",
                     end_col="end", ts_col="ts", bucket_seconds=300,
                     max_buckets_per_interval=1000, on_oversized="drop")
    assert [(r.iv_id, r.pt_id) for r in out.collect()] == [(1, 100)]


def test_oversized_mode_validated(frames):
    intervals, points = frames
    with pytest.raises(ValueError, match="on_oversized"):
        range_join(intervals, points, key="k", start_col="start",
                   end_col="end", ts_col="ts", on_oversized="clamp")
