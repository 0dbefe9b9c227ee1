"""As-of join semantics: inclusive <=, per-key isolation, NULL when no
prior right row exists, ties match.  Cross-checked against DuckDB's
native ASOF JOIN by the asof_join CORRECTNESS query."""

import datetime as dt

from tool_documentsconverter_spark.operators.asof import asof_join

T = lambda m: dt.datetime(2026, 1, 1, 12, m, 0)  # noqa: E731


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", T(10), "L1"), ("u1", T(30), "L2"),
         ("u2", T(5), "L3"),   # before any right row for u2
         ("u2", T(20), "L4"),  # exact tie with a right row
         ("u3", T(9), "L5")],  # key with no right rows at all
        "k string, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [("u1", T(8), 100), ("u1", T(25), 101), ("u1", T(31), 102),
         ("u2", T(20), 200)],
        "k string, ts timestamp, rid long",
    )
    got = {r.lbl: r.rid for r in
           asof_join(left, right, key="k", ts="ts",
                     right_cols=["rid"], prefix="").collect()}
    assert got["L1"] == 100   # latest right at-or-before 12:10
    assert got["L2"] == 101   # 12:31 right is in the future -> skip
    assert got["L3"] is None  # no prior right row
    assert got["L4"] == 200   # equal timestamps match (inclusive)
    assert got["L5"] is None  # key absent from right
    # every left row survives exactly once (left-join cardinality)
    assert len(got) == 5


def test_asof_join_right_tie_is_deterministic(spark):
    """Multiple right rows sharing the same (key, ts): the greatest
    payload struct wins, every run — the window orders by the payload
    as the final tie-break instead of shuffle arrival order."""
    left = spark.createDataFrame([("u", T(20), "L")],
                                 "k string, ts timestamp, lbl string")
    right = spark.createDataFrame(
        [("u", T(10), 5), ("u", T(10), 9), ("u", T(10), 1)],
        "k string, ts timestamp, rid long",
    )
    for _ in range(3):  # repartition shuffles arrival order between runs
        row = asof_join(left, right.repartition(8), "k", "ts",
                        ["rid"], prefix="").collect()[0]
        assert row.rid == 9


def test_asof_join_keeps_left_columns(spark):
    left = spark.createDataFrame([("a", T(1), 7, "x")],
                                 "k string, ts timestamp, n long, s string")
    right = spark.createDataFrame([("a", T(0), 1.5)],
                                  "k string, ts timestamp, v double")
    row = asof_join(left, right, "k", "ts", ["v"]).collect()[0]
    assert (row.k, row.n, row.s, row.asof_v) == ("a", 7, "x", 1.5)
