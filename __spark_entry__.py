"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship transcript-extraction query on
sf0.001; `queries()` exposes every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis); `oracle_sql()` gives the DuckDB
twin for each SQL-expressible one.

Cross-engine parity rules used throughout:
 - every hash is md5 (identical lowercase hex in Spark and DuckDB);
 - every float output is round(x, N) with N<=6;
 - every aggregate/computed column is aliased identically on both
   sides; Spark ints are cast to match DuckDB's BIGINT where needed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tool_documentsconverter_spark.functions.markdown import wrap_text_md
from tool_documentsconverter_spark.functions.sniff import sniff_format
from tool_documentsconverter_spark.functions.text import (PY_STRIP_RE,
                                                           sanitize_stem)
from tool_documentsconverter_spark.operators import dedup as D
from tool_documentsconverter_spark.operators import ranking as R
from tool_documentsconverter_spark.operators import similarity as SIM
from tool_documentsconverter_spark.operators import textstats as TS
from tool_documentsconverter_spark.plans.fanout import fan_out


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: documents -> synthetic transcript turns -> markdown extraction
# under stable (conv_id, turn_idx) ordering (the north-rule invariant)
# ---------------------------------------------------------------------------
def _transcript_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    t = docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "text",
    )
    stem = F.concat(
        F.col("conv_id"), F.lit("_"),
        F.lpad(F.col("turn_idx").cast("string"), 5, "0"),
    )
    return t.select(
        "conv_id", "turn_idx", wrap_text_md(stem, F.col("text")).alias("md")
    ).orderBy("conv_id", "turn_idx")


_TRANSCRIPT_FLAGSHIP_SQL = """
WITH t AS (
  SELECT source AS conv_id,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
              AS INTEGER) AS turn_idx,
         text
  FROM documents
)
SELECT conv_id, turn_idx,
       '# ' || conv_id || '_' || lpad(CAST(turn_idx AS VARCHAR), 5, '0')
       || chr(10) || chr(10) || '```text' || chr(10) || text
       || chr(10) || '```' || chr(10) AS md
FROM t
ORDER BY conv_id, turn_idx
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _transcript_flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# §2.4 / §2.10 — emission templates + scalar surface
# ---------------------------------------------------------------------------
def _q_text_wrap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    stem = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id", wrap_text_md(stem, F.col("text")).alias("md")
    )


_SQL_TEXT_WRAP = """
SELECT doc_id,
       '# doc-' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10)
       || '```text' || chr(10) || text || chr(10) || '```' || chr(10) AS md
FROM documents
"""


def _q_sanitize(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("a/"), F.col("source"), F.lit(':b*c?"d<e>f|'),
                     F.col("lang"))
    return docs.select("doc_id", sanitize_stem(dirty).alias("stem"))


# PY_STRIP_RE uses the \x{...} escape dialect both Java regex and RE2
# accept, so the oracle strips the exact Python str.strip() whitespace
# set the Spark Column twin does (ADVICE r5: bare \s is ASCII-only).
_SQL_SANITIZE = rf"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace('a/' || source || ':b*c?"d<e>f|' || lang,
                          '[/\\:*?"<>|]', '_', 'g'),
           '{PY_STRIP_RE}', '', 'g') AS cleaned
  FROM documents
)
SELECT doc_id,
       CASE WHEN cleaned = '' THEN 'document' ELSE cleaned END AS stem
FROM s
"""


def _q_sniff(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    payload = (
        F.when(F.col("doc_id") % 7 == 0, F.col("text"))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("%PDF-1.4\n"), F.col("text")))
        .when(F.col("doc_id") % 7 == 2,
              F.concat(F.lit('<?xml version="1.0"?><w:document><w:body>'),
                       F.col("text")))
        .when(F.col("doc_id") % 7 == 3,
              F.concat(F.lit("<!DOCTYPE html><html>"), F.col("text")))
        .when(F.col("doc_id") % 7 == 4,
              F.concat(F.lit("\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"),
                       F.col("text")))
        .when(F.col("doc_id") % 7 == 5,
              # leading whitespace before the html magic: the ltrim-vs-
              # lstrip trap (kernel strips all ws; SQL twin must too)
              F.concat(F.lit("\n\t <!DOCTYPE html><html>"), F.col("text")))
        .otherwise(F.concat(F.lit("<html><body>"), F.col("text")))
    )
    return docs.select(
        "doc_id", sniff_format(payload, F.lit("")).alias("fmt")
    )


_SQL_SNIFF = """
SELECT doc_id,
       CASE doc_id % 7
         WHEN 0 THEN 'text'
         WHEN 1 THEN 'pdf'
         WHEN 2 THEN 'docx'
         WHEN 3 THEN 'html'
         WHEN 4 THEN 'doc'
         WHEN 5 THEN 'html'
         ELSE 'html'
       END AS fmt
FROM documents
"""


def _q_heading_classifier(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    style = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("Heading 1"))
        .when(F.col("doc_id") % 6 == 1, F.lit("Heading 2"))
        .when(F.col("doc_id") % 6 == 2, F.lit("Heading 3"))
        .when(F.col("doc_id") % 6 == 3, F.lit("Heading 4"))
        .when(F.col("doc_id") % 6 == 4, F.lit("Title"))
        .otherwise(F.lit("Normal"))
    )
    # the reference quirk (docx_converter.py:79-85): Heading 2 -> 2,
    # Heading 3 -> 3, any other Heading* -> 1; non-Heading -> paragraph
    level = (
        F.when(style == "Heading 2", F.lit(2))
        .when(style == "Heading 3", F.lit(3))
        .when(style.startswith("Heading"), F.lit(1))
    )
    chunk = F.substring(F.col("text"), 1, 24)
    line = (
        F.when(level.isNotNull(),
               F.concat(F.repeat(F.lit("#"), level), F.lit(" "), chunk))
        .otherwise(chunk)
    )
    return docs.select("doc_id", style.alias("style"), line.alias("md_line"))


_SQL_HEADING = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'Heading 1' WHEN 1 THEN 'Heading 2'
         WHEN 2 THEN 'Heading 3' WHEN 3 THEN 'Heading 4'
         WHEN 4 THEN 'Title' ELSE 'Normal' END AS style,
       CASE
         WHEN doc_id % 6 = 1 THEN '## ' || substr(text, 1, 24)
         WHEN doc_id % 6 = 2 THEN '### ' || substr(text, 1, 24)
         WHEN doc_id % 6 IN (0, 3) THEN '# ' || substr(text, 1, 24)
         ELSE substr(text, 1, 24)
       END AS md_line
FROM documents
"""


def _q_message_tail(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.right(F.col("text"), F.lit(32)).alias("tail")
    )


_SQL_MESSAGE_TAIL = "SELECT doc_id, right(text, 32) AS tail FROM documents"


# ---------------------------------------------------------------------------
# §2.2 / §2.5 — predicates, anti-join skip, verify gate
# ---------------------------------------------------------------------------
def _q_skip_antijoin(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    done = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(done, on="doc_id", how="left_anti").select(
        "doc_id", "source", "n_chars"
    )


_SQL_SKIP_ANTIJOIN = """
SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 7 <> 0
"""


def _q_exclude_predicates(spark, sf_dir):
    # F1 exclude-dir + F2 hidden + F3 type-include predicates
    # (doc_to_md/main.py:207-216) over a derived path column; kept as
    # Column exprs so they push into the scan (SURVEY.md O2)
    docs = _t(spark, sf_dir, "documents")
    path = F.concat(F.col("source"), F.lit("/"),
                    F.when(F.col("doc_id") % 9 == 0, F.lit(".hidden/"))
                    .otherwise(F.lit("docs/")),
                    F.col("doc_id").cast("string"), F.lit(".pdf"))
    exclude = ["src3", "src7"]  # stand-in for .git/node_modules/...
    return (
        docs.withColumn("path", path)
        .where(~F.col("source").isin(exclude))           # F1
        .where(~F.col("path").contains("/.") )           # F2 hidden
        .where(F.col("lang").isin("en", "de", "fr"))     # F3 include
        .select("doc_id", "path", "lang")
    )


_SQL_EXCLUDE = """
SELECT doc_id,
       source || '/' || CASE WHEN doc_id % 9 = 0 THEN '.hidden/'
                             ELSE 'docs/' END
       || CAST(doc_id AS VARCHAR) || '.pdf' AS path,
       lang
FROM documents
WHERE source NOT IN ('src3', 'src7')
  AND doc_id % 9 <> 0
  AND lang IN ('en', 'de', 'fr')
"""


def _q_union_branches(spark, sf_dir):
    # §2.8 set ops: two projection branches recombined by name, then
    # distinct — the unionByName shape used when extraction branches
    # are split (the engine itself keeps a single stage; this proves
    # the operator)
    docs = _t(spark, sf_dir, "documents")
    a = docs.where(F.col("n_chars") > 300).select(
        "doc_id", F.lit("long").alias("kind"))
    b = docs.where(F.col("lang") == "zh").select(
        F.lit("zh").alias("kind"), "doc_id")  # reversed column order
    return a.unionByName(b).distinct()


_SQL_UNION = """
SELECT DISTINCT * FROM (
  SELECT doc_id, 'long' AS kind FROM documents WHERE n_chars > 300
  UNION ALL
  SELECT doc_id, 'zh' AS kind FROM documents WHERE lang = 'zh'
)
"""


def _q_sessionize(spark, sf_dir):
    # gap-based sessionization over the events stream: a new session
    # starts after a >30-minute silence per user (lag window + running
    # sum — the standard Spark shape; conversations sessionize the
    # same way over ts per conv_id)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.select(
        "user_id", "ts",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
        .alias("new_session"),
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("events"),
             F.unix_timestamp(F.min("ts")).alias("session_start_epoch"))
        .orderBy("user_id", "session_id")
    )


_SQL_SESSIONIZE = """
WITH marked AS (
  -- floor(epoch(..)) everywhere: Spark's unix_timestamp truncates
  -- sub-second precision, DuckDB's epoch() keeps it (and its
  -- double->bigint CAST rounds); align on whole seconds
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR floor(epoch(ts))
                   - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts))) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  -- CAST: DuckDB types integer sum() as HUGEINT (int128); the driver's
  -- value hash is type-sensitive, Spark emits BIGINT
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def _q_verify_gate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # simulate blank outputs for doc_id % 11 = 0 rows, then apply the
    # D2 gate (delete_manager.py:102-130) and aggregate A1-style
    md = F.when(F.col("doc_id") % 11 == 0, F.lit("  \n ")).otherwise(
        wrap_text_md(F.lit("d"), F.col("text"))
    )
    status = F.when(
        md.isNotNull() & (F.length(md) > 0)
        & F.substring(md, 1, 1024).rlike(r"\S"),
        F.lit("ok"),
    ).otherwise(F.lit("failed"))
    return (
        docs.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_SQL_VERIFY_GATE = """
WITH g AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN 'failed' ELSE 'ok' END AS status
  FROM documents
)
SELECT status, count(*) AS cnt FROM g GROUP BY status
"""


def _q_top1_per_source(spark, sf_dir):
    # W2 newest-by-mtime analog: max n_chars per source, deterministic
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", "doc_id", "n_chars")
    )


_SQL_TOP1 = """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def _q_lineage_agg(spark, sf_dir):
    # per-partition lineage rows (north_star) in SQL-checkable form
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", (F.col("doc_id") % 16).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.count_if(F.col("doc_id") % 13 == 0).alias("error_count"),
            F.sum("n_chars").alias("bytes_in"),
        )
        .orderBy("bucket")
    )


_SQL_LINEAGE = """
SELECT CAST(doc_id % 16 AS INTEGER) AS bucket,
       count(*) AS rows_in,
       count(*) FILTER (WHERE doc_id % 13 = 0) AS error_count,
       CAST(sum(n_chars) AS BIGINT) AS bytes_in
FROM documents GROUP BY 1 ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# §2.5/§2.6/§2.7 — joins, aggregation, windows on the TPC-H-ish tables
# ---------------------------------------------------------------------------
def _q_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _q_revenue_topk(spark, sf_dir):
    # Q3-ish: three-way join + agg + top-k
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_SQL_REVENUE_TOPK = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def _q_broadcast_dim(spark, sf_dir):
    # small-dim broadcast-hash join (SURVEY §2.5): nation x region
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy("r_name")
    )


_SQL_BROADCAST_DIM = """
SELECT r_name, count(*) AS customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def _q_rollup(spark, sf_dir):
    # hierarchical totals via ROLLUP (subtotal + grand-total rows);
    # grouping-set machinery the engine gets free from Catalyst
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def _q_percentiles(spark, sf_dir):
    # exact interpolated percentiles per group (Spark `percentile` ==
    # DuckDB `quantile_cont`, both linear interpolation)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 2).alias("p95"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("l_returnflag")
    )


_SQL_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def _q_events_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


_SQL_EVENTS_JSON = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       count(*) AS cnt,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def _q_asof_join(spark, sf_dir):
    """As-of join: for every purchase event, the user's most recent
    view event at-or-before it (the canonical attribution query)."""
    from tool_documentsconverter_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(purchases, views, key="user_id", ts="ts",
                    right_cols=["view_event_id"], prefix="")
    return out.select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("purchase_epoch"),
        "view_event_id",
    ).orderBy("event_id")


# DuckDB has a NATIVE ASOF JOIN — the strongest possible oracle for a
# hand-built distributed as-of (inclusive <=, same tie semantics)
_SQL_ASOF = """
SELECT p.event_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       v.event_id AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
ORDER BY p.event_id
"""


def _q_range_join(spark, sf_dir):
    """Range join (bucketed interval join): every `error` event opens a
    5-minute incident window for its user; count/summarize ALL events
    of that user inside the window.  The operator equi-joins on
    (user_id, time-bucket) — never a theta/cross join — see
    operators/rangejoin.py."""
    from tool_documentsconverter_spark.operators.rangejoin import range_join

    ev = _t(spark, sf_dir, "events")
    wins = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    pts = ev.select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    j = range_join(wins, pts, key="user_id", start_col="w_start",
                   end_col="w_end", ts_col="p_ts", bucket_seconds=300)
    return (
        j.groupBy("window_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("p_event_id").alias("first_event_id"),
            F.round(F.sum("p_value"), 2).alias("sum_value"),
        )
        .orderBy("window_id")
    )


# The oracle is the naive theta-join DuckDB can afford at sf0.01 —
# the strongest check that bucketing loses/duplicates no pairs
_SQL_RANGE_JOIN = """
SELECT w.event_id AS window_id, w.user_id,
       count(*) AS n_events,
       min(p.event_id) AS first_event_id,
       round(sum(p.value), 2) AS sum_value
FROM (SELECT * FROM events WHERE event_type = 'error') w
JOIN events p
  ON p.user_id = w.user_id
 AND p.ts >= w.ts AND p.ts <= w.ts + INTERVAL 5 MINUTE
GROUP BY 1, 2 ORDER BY 1
"""


def _q_events_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: one pass, GROUPING
    SETS (day x event_type), (day), (grand total) via ROLLUP — every
    aggregate is map-side combinable, so the continuous-aggregate
    pattern costs one shuffle at any scale."""
    ev = _t(spark, sf_dir, "events")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_epoch")
    return (
        ev.select(day, "event_type", "value")
        .rollup("day_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.coalesce("day_epoch", F.lit(-1)).alias("day_epoch"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events", "sum_value", "min_value", "max_value",
        )
        .orderBy("day_epoch", "event_type")
    )


_SQL_EVENTS_ROLLUP = """
WITH g AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS d,
         event_type AS et,
         count(*) AS n_events,
         round(sum(value), 2) AS sum_value,
         round(min(value), 4) AS min_value,
         round(max(value), 4) AS max_value
  FROM events GROUP BY ROLLUP (d, et)
)
SELECT coalesce(d, -1) AS day_epoch,
       coalesce(et, 'ALL') AS event_type,
       n_events, sum_value, min_value, max_value
FROM g ORDER BY day_epoch, event_type
"""


def _q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch")
    return (
        ev.select(hour, "event_id")
        .groupBy("hour_epoch")
        .agg(F.count(F.lit(1)).alias("events"))
        .orderBy("hour_epoch")
    )


_SQL_EVENTS_HOURLY = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       count(*) AS events
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: dedup family
# ---------------------------------------------------------------------------
def _q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup_keys(docs, "doc_id", "text")


_SQL_DEDUP_EXACT = """
SELECT md5(lower(trim(coalesce(text, '')))) AS content_md5,
       min(doc_id) AS keeper_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
"""

_SQL_SHINGLES_CTE = """
WITH toks AS (
  SELECT doc_id,
         string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS t
  FROM documents {where}
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks,
       LATERAL unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)
)
"""


def _q_minhash_sig(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    return D.minhash_signatures(docs, "doc_id", "text", n_bands=4)


_SQL_MINHASH_SIG = _SQL_SHINGLES_CTE.format(where="WHERE doc_id < 64") + """
SELECT doc_id, band, min(md5(CAST(band AS VARCHAR) || '|' || shingle)) AS minhash
FROM sh, LATERAL unnest([0, 1, 2, 3]) AS b(band)
GROUP BY doc_id, band
"""


def _q_minhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    return D.minhash_lsh_pairs(docs, "doc_id", "text", n_bands=4)


_SQL_MINHASH_PAIRS = _SQL_SHINGLES_CTE.format(where="WHERE doc_id < 64") + """
, sig AS (
  SELECT doc_id, band,
         min(md5(CAST(band AS VARCHAR) || '|' || shingle)) AS minhash
  FROM sh, LATERAL unnest([0, 1, 2, 3]) AS b(band)
  GROUP BY doc_id, band
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_bands
FROM sig a JOIN sig b ON a.band = b.band AND a.minhash = b.minhash
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def _q_incremental_dedup(spark, sf_dir):
    """Incremental (streaming) MinHash/LSH dedup: the documents table
    arrives as 2 availableNow micro-batches; per batch, new signatures
    are upserted into a committed signature table and candidate pairs
    are generated against it (broadcast probe of the new batch — the
    committed table is never shuffled).  The union of the per-batch
    pair partitions must equal the batch operator's output over the
    full corpus (exact here because no bucket crosses max_bucket
    mid-stream on this input; the guard is no-retract, see
    streaming/dedup_stream.py) — the oracle is the SAME SQL as
    minhash_lsh_pairs
    (streaming/dedup_stream.py; crash-restart exactly-once pinned by
    tests/test_stream_dedup.py)."""
    import shutil
    import tempfile

    from tool_documentsconverter_spark.streaming.dedup_stream import (
        read_pairs,
        run_stream_dedup,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 64)
        .select("doc_id", "text")
    )
    base = tempfile.mkdtemp(prefix="incr_dedup_")
    try:
        inp = f"{base}/in"
        docs.repartition(4).write.parquet(inp)
        q = run_stream_dedup(spark, inp, f"{base}/sig", f"{base}/pairs",
                             f"{base}/ckpt", n_bands=4,
                             max_files_per_trigger=2)
        # awaitTermination returns False on timeout — in that case the
        # pairs directory is partial and the finally-rmtree would pull
        # files out from under a still-running query (ADVICE r5);
        # stop() first and raise a clear timeout instead
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "incremental_dedup stream did not finish within 300s")
        out = read_pairs(spark, f"{base}/pairs").orderBy("id_a", "id_b")
        # materialize before the temp dir disappears
        result = spark.createDataFrame(out.collect(), out.schema)
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)


_SQL_INCREMENTAL_DEDUP = _SQL_MINHASH_PAIRS + "ORDER BY 1, 2\n"


def _q_dedup_compaction(spark, sf_dir):
    """Streaming-dedup retraction path (VERDICT r5 item 7): ten clones
    of doc 0 are appended to the corpus so their LSH bucket CROSSES
    max_bucket=4 mid-stream (1-file triggers).  The no-retract guard
    leaves the early-emitted clone pairs behind; compact_pairs replays
    the committed signature table with the batch guard (final bucket
    sizes) and tombstones them, so read_pairs_compacted equals the
    batch operator minhash_lsh_pairs(max_bucket=4) over the full
    synthesized corpus — which is exactly what the DuckDB oracle
    computes (streaming/dedup_stream.py compact_pairs;
    tests/test_stream_dedup.py pins convergence + the no-op case)."""
    import shutil
    import tempfile

    from tool_documentsconverter_spark.streaming.dedup_stream import (
        compact_pairs,
        read_pairs_compacted,
        run_stream_dedup,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 48)
        .select("doc_id", "text")
    )
    clone_text = docs.where(F.col("doc_id") == 0).select("text")
    clones = (
        spark.range(10)
        .select((F.col("id") + 1000).alias("doc_id"))
        .crossJoin(F.broadcast(clone_text))
    )
    corpus = docs.unionByName(clones)
    base = tempfile.mkdtemp(prefix="dedup_compact_")
    try:
        inp = f"{base}/in"
        corpus.repartition(5).write.parquet(inp)
        q = run_stream_dedup(spark, inp, f"{base}/sig", f"{base}/pairs",
                             f"{base}/ckpt", n_bands=4, max_bucket=4,
                             max_files_per_trigger=1)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "dedup_compaction stream did not finish within 300s")
        compact_pairs(spark, f"{base}/sig", f"{base}/pairs",
                      f"{base}/comp", max_bucket=4)
        out = (read_pairs_compacted(spark, f"{base}/pairs", f"{base}/comp")
               .orderBy("id_a", "id_b"))
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# Batch truth over the synthesized corpus (docs<48 + 10 clones of doc
# 0) WITH the bucket cap replayed: windowed bucket count <= 4 before
# the self-join — the guard semantics of minhash_lsh_pairs.
_SQL_DEDUP_COMPACTION = r"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 48
  UNION ALL
  SELECT 1000 + i AS doc_id,
         (SELECT text FROM documents WHERE doc_id = 0) AS text
  FROM range(10) t(i)
), toks AS (
  SELECT doc_id,
         string_split_regex(lower(trim(coalesce(text, ''))), '\s+') AS t
  FROM docs
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM toks,
       LATERAL unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)
), sig AS (
  SELECT doc_id, band,
         min(md5(CAST(band AS VARCHAR) || '|' || shingle)) AS minhash
  FROM sh, LATERAL unnest([0, 1, 2, 3]) AS b(band)
  GROUP BY doc_id, band
), bounded AS (
  SELECT doc_id, band, minhash FROM (
    SELECT sig.*, count(*) OVER (PARTITION BY band, minhash) AS n
    FROM sig)
  WHERE n <= 4
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_bands
FROM bounded a JOIN bounded b
  ON a.band = b.band AND a.minhash = b.minhash
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


def _q_domain_stats(spark, sf_dir):
    """Corpus domain table (web-curation staple): per-occurrence URL
    hosts extracted with one codegen regexp_extract_all, lowercased,
    www-stripped, exploded once; ONE aggregation computes doc_count
    (distinct docs) and ref_count together (operators/textstats.py
    domain_stats).  Input synthesized deterministically (the driver
    documents table carries no URLs): doc i references
    site{i%7}.example twice (once behind www+mixed case — exercising
    normalization) and cdn{i%3}.example once."""
    rows = [
        (i, f"Visit https://www.Site{i % 7}.example/p{i} twice "
            f"https://site{i % 7}.example/q and "
            f"http://cdn{i % 3}.example/img{i}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return TS.domain_stats(df).orderBy("domain")


_SQL_DOMAIN_STATS = """
WITH ids AS (SELECT i FROM range(0, 300) t(i)),
refs AS (
  SELECT 'site' || (i % 7) || '.example' AS domain, i, 2 AS refs FROM ids
  UNION ALL
  SELECT 'cdn' || (i % 3) || '.example', i, 1 FROM ids
)
SELECT domain,
       CAST(count(DISTINCT i) AS BIGINT) AS doc_count,
       CAST(sum(refs) AS BIGINT) AS ref_count
FROM refs GROUP BY domain ORDER BY domain
"""


def _q_dup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n_bands=4)
    return D.cluster_duplicates(pairs).orderBy("doc_id")


# same banding-LSH pair generation as minhash_lsh_pairs, then connected
# components via a recursive reachability CTE (min label per component)
_SQL_DUP_CLUSTERS = ("WITH RECURSIVE " + _SQL_SHINGLES_CTE.format(
    where="WHERE doc_id < 64").replace("WITH ", "", 1)) + """
, sig AS (
  SELECT doc_id, band,
         min(md5(CAST(band AS VARCHAR) || '|' || shingle)) AS minhash
  FROM sh, LATERAL unnest([0, 1, 2, 3]) AS b(band)
  GROUP BY doc_id, band
), prs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.minhash = b.minhash
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT id_a, id_b FROM prs
  UNION ALL
  SELECT id_b, id_a FROM prs
), nodes AS (SELECT DISTINCT id_a AS id FROM edges),
reach AS (
  SELECT id, id AS label FROM nodes
  UNION
  SELECT e.id_b AS id, r.label
  FROM reach r JOIN edges e ON e.id_a = r.id
), comp AS (
  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
), sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT c.id AS doc_id, c.cluster_id, s.cluster_size
FROM comp c JOIN sizes s USING (cluster_id)
ORDER BY doc_id
"""


def _q_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    mx = 99
    pairs = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    ).where(F.col("id_b") <= mx)
    return D.ngram_jaccard(docs, "doc_id", "text", pairs).select(
        "id_a", "id_b", "jaccard"
    )


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination: every 50th document plays the
    held-out benchmark; corpus documents sharing any word 3-shingle
    with it are flagged with their distinct-overlap count."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return (
        D.contamination_check(corpus, bench, "doc_id", "text")
        .orderBy("doc_id")
    )


_SQL_CONTAMINATION = _SQL_SHINGLES_CTE.format(
    where="WHERE doc_id % 50 <> 0") + """
, bt AS (
  SELECT string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS t
  FROM documents WHERE doc_id % 50 = 0
), bsh AS (
  SELECT DISTINCT array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM bt, LATERAL unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS overlap_shingles
FROM sh JOIN bsh USING (shingle)
GROUP BY doc_id ORDER BY doc_id
"""


_SQL_NGRAM_JACCARD = _SQL_SHINGLES_CTE.format(where="WHERE doc_id < 100") + """
, sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
  WHERE doc_id < 100 AND doc_id + 1 <= 99
),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS inter_sz
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b,
       round(coalesce(i.inter_sz, 0)
             / (za.sz + zb.sz - coalesce(i.inter_sz, 0)), 6) AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
JOIN sizes za ON za.doc_id = p.id_a
JOIN sizes zb ON zb.doc_id = p.id_b
"""


def _q_embedding_cosine_dups(spark, sf_dir):
    # 2 bands x 4 bits (planes 0..7) is the ORACLE configuration: small
    # enough that 16-bucket bands still collide at sf test scale; the
    # operator's production defaults are 4 bands x 12 bits + the
    # max_bucket guard (inert here, replayed by the SQL anyway)
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return D.embedding_cosine_dups(
        docs, "doc_id", "text", dim=16, n_bands=2, bits_per_band=4,
        threshold=0.95, max_bucket=1000,
    ).orderBy("id_a", "id_b")


# full replay of operators/dedup.py hashed_embedding + the BANDED md5
# hyperplane signatures (band b = planes b*4..b*4+3) + the max_bucket
# exclusion + distinct-candidate cosine gate — every stage is
# md5-derived precisely so this SQL can reproduce it
_SQL_EMB_COSINE = r"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))),
                                     '\s+')) AS tok
    FROM documents WHERE doc_id < 200
  ) WHERE tok <> ''
), dims AS (
  SELECT doc_id,
         (CASE WHEN substr(md5(tok), 1, 1) BETWEEN '0' AND '9'
               THEN ascii(substr(md5(tok), 1, 1)) - 48
               ELSE ascii(substr(md5(tok), 1, 1)) - 87 END) % 16 AS d,
         count(*) AS c
  FROM toks GROUP BY 1, 2
), ids AS (SELECT DISTINCT doc_id FROM toks),
dense AS (
  SELECT i.doc_id, r.range AS d, CAST(coalesce(m.c, 0) AS DOUBLE) AS c
  FROM ids i CROSS JOIN range(16) r
  LEFT JOIN dims m ON m.doc_id = i.doc_id AND m.d = r.range
), vecs AS (
  SELECT doc_id, list(c ORDER BY d) AS vec FROM dense GROUP BY doc_id
), pw AS (
  SELECT p,
         list(CASE WHEN substr(h, 1, 1) BETWEEN '0' AND '9'
                   THEN ascii(substr(h, 1, 1)) - 48
                   ELSE ascii(substr(h, 1, 1)) - 87 END - 7.5
              ORDER BY d) AS ws
  FROM (
    SELECT p, d, md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)) AS h
    FROM range(8) t(p), range(16) u(d)
  ) GROUP BY p
), sigs AS (
  SELECT v.doc_id, pw.p // 4 AS band,
         string_agg(
           CASE WHEN list_sum(list_transform(range(1, 17),
                  i -> v.vec[i] * pw.ws[i])) >= 0
                THEN '1' ELSE '0' END, '' ORDER BY pw.p) AS sig
  FROM vecs v, pw
  GROUP BY v.doc_id, band
), keep AS (
  SELECT band, sig
  FROM (SELECT band, sig, count(*) AS bucket_n FROM sigs GROUP BY 1, 2)
  WHERE bucket_n <= 1000
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sigs a
  JOIN keep k ON k.band = a.band AND k.sig = a.sig
  JOIN sigs b ON a.band = b.band AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
), scored AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(va.vec, vb.vec)
               / (sqrt(list_dot_product(va.vec, va.vec))
                  * sqrt(list_dot_product(vb.vec, vb.vec))), 6) AS cosine
  FROM cand c
  JOIN vecs va ON va.doc_id = c.id_a
  JOIN vecs vb ON vb.doc_id = c.id_b
)
SELECT id_a, id_b, cosine FROM scored
WHERE cosine >= 0.95
ORDER BY id_a, id_b
"""


def _q_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return D.simhash(docs, "doc_id", "text", n_bits=16)


_SQL_SIMHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+')) AS tok
    FROM documents WHERE doc_id < 100
  ) WHERE tok <> ''
), dims AS (
  SELECT doc_id, bit,
         CASE WHEN substr(md5(tok), bit, 1) >= '8' THEN 1 ELSE -1 END AS w
  FROM toks, LATERAL unnest(range(1, 17)) AS u(bit)
), bits AS (
  SELECT doc_id, bit, CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS b
  FROM dims GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(b * pow(2.0, 16 - bit)) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis
# ---------------------------------------------------------------------------
def _q_textstats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TS.ws_token_count(F.col("text")).cast("long").alias("ws_tokens"),
        TS.bpe_token_count(F.col("text")).cast("long").alias("bpe_tokens"),
        F.round(TS.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(TS.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        F.round(TS.mean_word_len(F.col("text")), 6).alias("mean_word_len"),
        TS.quality_score(F.col("text")).alias("quality"),
        TS.doc_fingerprint(F.col("text")).alias("fingerprint"),
    )


_SQL_TEXTSTATS = r"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         trim(coalesce(text, '')) AS tt,
         lower(trim(coalesce(text, ''))) AS lt
  FROM documents
), tok AS (
  SELECT doc_id, t, tt, lt,
         string_split_regex(tt, '\s+') AS toks,
         string_split_regex(lower(tt), '\s+') AS ltoks,
         string_split_regex(lt, '\s+') AS nt
  FROM base
), stats AS (
  SELECT doc_id, t, tt, lt, nt,
    CASE WHEN tt = '' THEN 0 ELSE len(toks) END AS ws_tokens,
    len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
    CASE WHEN length(t) = 0 THEN 0.0
         ELSE len(regexp_extract_all(t, '[^\w\s]')) * 1.0 / length(t)
    END AS praw,
    CASE WHEN lower(tt) = '' OR len(ltoks) = 0 THEN 0.0
         ELSE len(list_filter(ltoks,
                  x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
              / len(ltoks)
    END AS sraw,
    CASE WHEN tt = '' THEN 0.0
         ELSE list_aggregate(list_transform(toks, x -> length(x)), 'sum')
              * 1.0 / len(toks)
    END AS mraw
  FROM tok
)
SELECT doc_id,
  CAST(ws_tokens AS BIGINT) AS ws_tokens,
  CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
  round(praw, 6) AS punct_ratio,
  round(sraw, 6) AS stopword_ratio,
  round(mraw, 6) AS mean_word_len,
  round((least(length(t) / 500.0, 1.0)
         + (1.0 - least(praw * 5.0, 1.0))
         + least(sraw * 4.0, 1.0)) / 3.0, 6) AS quality,
  CASE WHEN lt = '' THEN NULL
       ELSE list_aggregate(
              list_transform(
                range(0, greatest(len(nt) - 3, 0) + 1),
                i -> md5(array_to_string(list_slice(nt, i + 1, i + 3), ' '))),
              'min')
  END AS fingerprint
FROM stats
"""


def _q_normalize_scrub(spark, sf_dir):
    from tool_documentsconverter_spark.functions.text import (
        normalize_text,
        scrub_pii,
    )

    docs = _t(spark, sf_dir, "documents")
    mess = F.concat(
        F.lit("see https://ex.com/a?b=1 or mail u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1 (555) 123-4567 end"),
        F.lit("\u200b\x01\u00a0multi  space\t\ttail  \n line2  "),
        F.col("text"),
    )
    return docs.select(
        "doc_id",
        normalize_text(mess).alias("normalized"),
        scrub_pii(mess).alias("scrubbed"),
    ).orderBy("doc_id")


_SQL_NORMALIZE_SCRUB = r"""
WITH m AS (
  SELECT doc_id,
         'see https://ex.com/a?b=1 or mail u' || CAST(doc_id AS VARCHAR)
         || '@example.com call +1 (555) 123-4567 end' || chr(8203)
         || chr(1) || chr(160) || 'multi  space' || chr(9) || chr(9)
         || 'tail  ' || chr(10) || ' line2  ' || text AS mess
  FROM documents
)
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(mess, '[\x{200B}\x{200C}\x{200D}\x{2060}\x{FEFF}]',
                           '', 'g'),
            '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]',
          ' ', 'g'),
        '[ \t]+', ' ', 'g'),
      '[ \t]+\n', chr(10), 'g'),
    '^\s+|\s+$', '', 'g') AS normalized,
  regexp_replace(
    regexp_replace(
      regexp_replace(mess, 'https?://[^\s<>"]+', '<URL>', 'g'),
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '[0-9][0-9 ()+.-]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
FROM m ORDER BY doc_id
"""


# mojibake suffix injected into every document for the repair query:
# cp1252-damaged forms of ' " ” — é « » ° plus the Â+nbsp pair; the
#  entry exercises the latin-1 (unmapped-in-cp1252) variant
_MOJI_SUFFIX = (" itâ€™s â€œquoted"
                "â€ â€” cafÃ© "
                "Â«gÂ» 25Â° "
                "endÂ here")


def _q_mojibake_repair(spark, sf_dir):
    """Double-encoding (UTF-8 read as cp1252) repair: every document
    gets a deterministically corrupted suffix; fix_mojibake's replace
    chain must restore it, and the oracle replays the SAME chain
    (generated from the one MOJIBAKE_FIXES table, so engine and oracle
    cannot drift).  chars_saved pins the CHARACTER-length delta of the
    repair (each 3-char "â€x" collapses to 1 char = 2 saved; byte
    deltas would be larger and are not what either engine computes)."""
    from tool_documentsconverter_spark.functions.text import fix_mojibake

    docs = _t(spark, sf_dir, "documents")
    corrupted = F.concat(F.coalesce(F.col("text"), F.lit("")),
                         F.lit(_MOJI_SUFFIX))
    repaired = fix_mojibake(corrupted)
    return docs.select(
        "doc_id",
        repaired.alias("repaired"),
        (F.length(corrupted) - F.length(repaired))
        .cast("int").alias("chars_saved"),
    ).orderBy("doc_id")


def _sql_mojibake() -> str:
    """Oracle generated from MOJIBAKE_FIXES — one source of truth for
    both engines' replace chains."""
    from tool_documentsconverter_spark.functions.text import MOJIBAKE_FIXES

    def lit(s: str) -> str:
        # embed non-ASCII / control chars via chr() so the SQL string
        # survives any transport encoding
        parts, buf = [], []
        for ch in s:
            if 0x20 <= ord(ch) < 0x7F and ch != "'":
                buf.append(ch)
            else:
                if buf:
                    parts.append("'" + "".join(buf) + "'")
                    buf = []
                parts.append(f"chr({ord(ch)})")
        if buf:
            parts.append("'" + "".join(buf) + "'")
        return " || ".join(parts) if parts else "''"

    expr = "corrupted"
    for bad, good in MOJIBAKE_FIXES:
        expr = f"replace({expr}, {lit(bad)}, {lit(good)})"
    return f"""
WITH m AS (
  SELECT doc_id, coalesce(text, '') || {lit(_MOJI_SUFFIX)} AS corrupted
  FROM documents
), r AS (
  SELECT doc_id, corrupted, {expr} AS repaired FROM m
)
SELECT doc_id, repaired,
       CAST(length(corrupted) - length(repaired) AS INTEGER) AS chars_saved
FROM r ORDER BY doc_id
"""


def _q_cjk_textstats(spark, sf_dir):
    """CJK-aware token accounting (the reference's own corpus is
    Chinese): every document gets a deterministic mixed-script suffix;
    whitespace counting sees each CJK run as ONE token while the
    CJK-aware count treats every Han/kana/Hangul char as a token —
    both reported, oracle replays both (operators/textstats.py
    cjk_aware_token_count)."""
    docs = _t(spark, sf_dir, "documents")
    mixed = F.concat(F.coalesce(F.col("text"), F.lit("")),
                     F.lit(" 这是一个测试句子 mixed ハローワールド end"))
    return docs.select(
        "doc_id",
        TS.ws_token_count(mixed).alias("ws_tokens"),
        TS.cjk_char_count(mixed).alias("cjk_chars"),
        TS.cjk_aware_token_count(mixed).alias("cjk_aware_tokens"),
    ).orderBy("doc_id")


_SQL_CJK_TEXTSTATS = r"""
WITH m AS (
  SELECT doc_id,
         coalesce(text, '') || ' ' || chr(36825) || chr(26159) || chr(19968)
         || chr(20010) || chr(27979) || chr(35797) || chr(21477)
         || chr(23376) || ' mixed ' || chr(12495) || chr(12525) || chr(12540)
         || chr(12527) || chr(12540) || chr(12523) || chr(12489)
         || ' end' AS t
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN trim(t) = '' THEN 0
            ELSE len(string_split_regex(trim(t), '\s+')) END AS INTEGER)
         AS ws_tokens,
       CAST(len(regexp_extract_all(t,
         '[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]'))
         AS INTEGER) AS cjk_chars,
       CAST(len(regexp_extract_all(t,
         '[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]'))
         + CASE WHEN trim(regexp_replace(t,
             '[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]',
             ' ', 'g')) = '' THEN 0
           ELSE len(string_split_regex(trim(regexp_replace(t,
             '[\x{3040}-\x{30FF}\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]',
             ' ', 'g')), '\s+')) END AS INTEGER) AS cjk_aware_tokens
FROM m ORDER BY doc_id
"""


def _q_repetition_signals(spark, sf_dir):
    """Gopher n-gram repetition: most-frequent-bigram char coverage and
    duplicated-trigram char coverage per document.  Shuffle-free: the
    per-document facts never leave the row — array_sort over the
    n-gram array plus one F.aggregate fold run-length-encodes equal
    runs (operators/textstats.py repetition_signals; zero exchanges,
    pinned by tests/test_plans.py::test_repetition_signals_is_shuffle_free)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        TS.repetition_signals(docs)
        .orderBy("doc_id")
    )


_SQL_REPETITION = r"""
WITH base AS (
  SELECT doc_id, lower(trim(coalesce(text, ''))) AS t FROM documents
), tok AS (
  SELECT doc_id, length(t) AS n_chars,
         string_split_regex(t, '\s+') AS toks
  FROM base
), g AS (
  SELECT doc_id, n_chars, 2 AS n,
         array_to_string(list_slice(toks, k + 1, k + 2), ' ') AS gr
  FROM tok, LATERAL unnest(range(0, greatest(len(toks) - 2, 0) + 1)) u(k)
  UNION ALL
  SELECT doc_id, n_chars, 3,
         array_to_string(list_slice(toks, k + 1, k + 3), ' ')
  FROM tok, LATERAL unnest(range(0, greatest(len(toks) - 3, 0) + 1)) u(k)
), c AS (
  SELECT doc_id, n_chars, n, gr, count(*) AS c
  FROM g GROUP BY doc_id, n_chars, n, gr
)
SELECT doc_id,
       round(CASE WHEN n_chars = 0 THEN 0.0
             ELSE coalesce(max(CASE WHEN n = 2 THEN c * length(gr) END), 0)
                  * 1.0 / n_chars END, 6) AS top_ngram_frac,
       round(CASE WHEN n_chars = 0 THEN 0.0
             ELSE coalesce(sum(CASE WHEN n = 3 AND c > 1
                                    THEN c * length(gr) END), 0)
                  * 1.0 / n_chars END, 6) AS dup_ngram_frac
FROM c GROUP BY doc_id, n_chars ORDER BY doc_id
"""


def _q_gopher_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(TS.frac_duplicate_lines(F.col("text")), 6).alias("dup_line_frac"),
        F.round(TS.frac_bullet_lines(F.col("text")), 6).alias("bullet_frac"),
        F.round(TS.frac_alpha_words(F.col("text")), 6).alias("alpha_frac"),
        F.round(TS.symbol_word_ratio(F.col("text")), 6).alias("symbol_ratio"),
        TS.gopher_flags(F.col("text"), min_words=20).alias("keep"),
    ).orderBy("doc_id")


_SQL_GOPHER = r"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         trim(coalesce(text, '')) AS tt,
         list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                    x -> trim(x)), x -> x <> '') AS lines,
         string_split_regex(trim(coalesce(text, '')), '\s+') AS toks
  FROM documents
), sig AS (
  SELECT doc_id, t, tt, toks,
    CASE WHEN len(lines) = 0 THEN 0.0
         ELSE (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines)
    END AS dup_line_frac,
    CASE WHEN len(lines) = 0 THEN 0.0
         ELSE len(list_filter(lines, x -> regexp_matches(x, '^[-*•]')))
              * 1.0 / len(lines)
    END AS bullet_frac,
    CASE WHEN tt = '' OR len(toks) = 0 THEN 0.0
         ELSE len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              * 1.0 / len(toks)
    END AS alpha_frac,
    CASE WHEN tt = '' THEN 0 ELSE len(toks) END AS words,
    CASE WHEN tt = '' THEN 0.0
         ELSE list_aggregate(list_transform(toks, x -> length(x)), 'sum')
              * 1.0 / len(toks)
    END AS mwl,
    CASE WHEN tt = '' OR len(toks) = 0 THEN 0.0
         ELSE len(regexp_extract_all(t, '#|\.\.\.')) * 1.0
              / CASE WHEN tt = '' THEN 1 ELSE len(toks) END
    END AS symbol_ratio
  FROM base
)
SELECT doc_id,
       round(dup_line_frac, 6) AS dup_line_frac,
       round(bullet_frac, 6) AS bullet_frac,
       round(alpha_frac, 6) AS alpha_frac,
       round(symbol_ratio, 6) AS symbol_ratio,
       (dup_line_frac <= 0.3 AND bullet_frac <= 0.9
        AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1
        AND words >= 20 AND words <= 100000
        AND mwl >= 3.0 AND mwl <= 10.0) AS keep
FROM sig ORDER BY doc_id
"""


def _q_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return TS.detect_language(docs, "doc_id", "text", spark).select(
        "doc_id", "detected_lang", F.col("marker_hits").cast("long").alias("marker_hits")
    )


_SQL_LANGID = r"""
WITH markers(lang, marker) AS (VALUES
  ('en','the'),('en','and'),('en','of'),('en','is'),('en','to'),
  ('de','der'),('de','die'),('de','und'),('de','ist'),('de','nicht'),
  ('fr','le'),('fr','la'),('fr','et'),('fr','est'),('fr','les'),
  ('es','el'),('es','la'),('es','que'),('es','de'),('es','es'),
  ('zh','的'),('zh','是'),('zh','了'),('zh','在'),('zh','我')
), toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS tok
  FROM documents
), hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM toks t JOIN markers m ON t.tok = m.marker
  GROUP BY 1, 2
), best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.lang, 'und') AS detected_lang,
       coalesce(b.hits, 0) AS marker_hits
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
"""


def _q_corpus_curation(spark, sf_dir):
    """The composite training-data pipeline: quality-gate -> exact-dedup
    keeper selection -> language ID, all in one plan (the shape a 100 TB
    curation job actually runs; each stage is the operator proven
    individually above)."""
    # round-8 shape: ONE scan, ONE evaluation of quality_score.  The
    # previous plan computed the quality-scored subtree three times
    # (keepers side, kept side of a doc_id self-join, then the whole
    # thing AGAIN for the language join) — 16 Exchanges, 6.7s at
    # sf1.0.  Keeper selection is a single min_by aggregate (the
    # min-doc_id row per content group, map-side combinable) whose
    # FILTER clause applies the quality gate INSIDE the aggregate — a
    # plain .where() on the projected column gets pushed below the
    # projection and re-evaluates the whole quality expression per row
    # (measured 0.6s -> 2.1s for the scored stage alone).  Groups with
    # no gated row aggregate to NULL and are dropped, which is exactly
    # the old semantics: doc_id is unique, so min_by picks the row the
    # keepers-join kept.  detect_language is a pure column expression
    # and attaches directly — no self-joins anywhere.  fan_out spreads
    # the narrow scoring stage on a single-file scan (§2.6).
    docs = fan_out(_t(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", "text",
        TS.quality_score(F.col("text")).alias("quality"),
        F.md5(F.lower(F.trim(F.coalesce(F.col("text"), F.lit(""))))
              ).alias("content_md5"),
    )
    kept = (
        scored.groupBy("content_md5")
        .agg(F.expr("min_by(struct(doc_id, text, quality), doc_id) "
                    "FILTER (WHERE quality >= 0.5)").alias("_w"))
        .where(F.col("_w").isNotNull())
        .select("_w.doc_id", "_w.text", "_w.quality")
    )
    kept = TS.detect_language(kept, "doc_id", "text", spark)
    return (
        kept.groupBy("detected_lang")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.round(F.avg("quality"), 6).alias("avg_quality"))
        .orderBy("detected_lang")
    )


_SQL_CURATION = r"""
WITH scored AS (
  SELECT doc_id, text,
         round((least(length(coalesce(text,'')) / 500.0, 1.0)
           + (1.0 - least(CASE WHEN length(coalesce(text,'')) = 0 THEN 0.0
               ELSE len(regexp_extract_all(coalesce(text,''), '[^\w\s]'))
                    * 1.0 / length(coalesce(text,'')) END * 5.0, 1.0))
           + least(CASE WHEN lower(trim(coalesce(text,''))) = '' THEN 0.0
               ELSE len(list_filter(
                      string_split_regex(lower(trim(coalesce(text,''))), '\s+'),
                      x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
                    / len(string_split_regex(lower(trim(coalesce(text,''))), '\s+'))
               END * 4.0, 1.0)) / 3.0, 6) AS quality,
         md5(lower(trim(coalesce(text, '')))) AS content_md5
  FROM documents
), gated AS (
  SELECT * FROM scored WHERE quality >= 0.5
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM gated GROUP BY content_md5
), kept AS (
  SELECT g.* FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
), markers(lang, marker) AS (VALUES
  ('en','the'),('en','and'),('en','of'),('en','is'),('en','to'),
  ('de','der'),('de','die'),('de','und'),('de','ist'),('de','nicht'),
  ('fr','le'),('fr','la'),('fr','et'),('fr','est'),('fr','les'),
  ('es','el'),('es','la'),('es','que'),('es','de'),('es','es'),
  ('zh','的'),('zh','是'),('zh','了'),('zh','在'),('zh','我')
), toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')) AS tok
  FROM kept
), hits AS (
  SELECT t.doc_id, m.lang, count(*) AS hits
  FROM toks t JOIN markers m ON t.tok = m.marker GROUP BY 1, 2
), best AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, lang ASC) AS rn
    FROM hits) WHERE rn = 1
)
SELECT coalesce(b.lang, 'und') AS detected_lang,
       count(*) AS docs,
       round(avg(k.quality), 6) AS avg_quality
FROM kept k LEFT JOIN best b ON k.doc_id = b.doc_id
GROUP BY 1 ORDER BY 1
"""


def _q_text_chunks(spark, sf_dir):
    """Training-prep chunking over a deterministic hash sample: keep
    the md5-bucketed 50% of documents (reproducible across runs,
    cluster sizes, and engines — df.sample() is none of those), then
    slide a 32-token window with stride 24 (8-token overlap).  Zero
    shuffles: the sample is a filter, the chunk fan-out an explode."""
    from tool_documentsconverter_spark.operators.textprep import (
        chunk_documents,
        hash_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        chunk_documents(hash_sample(docs, 0.5), chunk_tokens=32, stride=24)
        .orderBy("doc_id", "chunk_idx")
    )


_SQL_TEXT_CHUNKS = r"""
WITH sampled AS (
  SELECT doc_id, string_split_regex(coalesce(text, ''), '\s+') AS toks
  FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        < 2147483648
), n AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - 32) / 24.0) AS INTEGER) + 1)
           AS n_chunks
  FROM sampled
)
SELECT doc_id,
       CAST(k AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(toks, k * 24 + 1, k * 24 + 32), ' ')
         AS chunk_text,
       CAST(len(list_slice(toks, k * 24 + 1, k * 24 + 32)) AS INTEGER)
         AS n_tokens
FROM n, LATERAL unnest(range(0, n_chunks)) AS u(k)
ORDER BY doc_id, chunk_idx
"""


def _q_stratified_sample(spark, sf_dir):
    """Exactly 5 documents per language stratum, picked by md5 hash
    order of doc_id — a deterministic reservoir the oracle replays
    with the same window."""
    from tool_documentsconverter_spark.operators.textprep import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return (
        stratified_sample(docs, strata_col="lang", k=5)
        .orderBy("lang", "doc_id")
    )


_SQL_STRATIFIED = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
ORDER BY lang, doc_id
"""


def _q_seq_packing(spark, sf_dir):
    """Concat-and-split sequence packing: within each source shard,
    documents in doc_id order form one token stream cut into 256-token
    training windows; a document belongs to the bin where it starts.
    The per-doc manifest (bin, offset) is what a trainer's loader
    shuffles — and the window math is fully SQL-replayable."""
    from tool_documentsconverter_spark.operators.textprep import (
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    return (
        pack_sequences(docs, budget_tokens=256, part_col="source")
        .orderBy("source", "doc_id")
    )


_SQL_SEQ_PACKING = r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(coalesce(text, ''), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
), w AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS tok_offset
  FROM t
)
SELECT source, doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / 256.0) AS BIGINT) AS bin
FROM w
ORDER BY source, doc_id
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: similarity search over embeddings
# ---------------------------------------------------------------------------
def _q_ann_brute(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    return SIM.brute_force_topk(emb, queries, k=5)


_SQL_ANN_BRUTE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(
           list_dot_product(q.qv, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))), 6) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC)
            AS INTEGER) AS rank,
       score
FROM scored
QUALIFY rank <= 5
"""


def _q_embedding_quantize(spark, sf_dir):
    """Symmetric int8-range embedding quantization (the 4x
    storage/bandwidth lever for ANN at corpus scale): per-vector
    scale = max|v|, codes = round(v*127/scale), all codegen
    higher-order functions (operators/similarity.py
    quantize_embeddings).  Codes returned as a CSV string so the
    cross-engine compare is exact; dequantized-scoring recall floor
    pinned in tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    q = SIM.quantize_embeddings(emb)
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
    ).orderBy("vec_id")


_SQL_EMBEDDING_QUANTIZE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
  FROM embeddings
)
SELECT vec_id,
       round(m, 6) AS scale,
       CASE WHEN m = 0
            THEN array_to_string(list_transform(e, x -> 0), ',')
            ELSE array_to_string(
              list_transform(e, x -> CAST(round(x * 127 / m) AS INTEGER)),
              ',')
       END AS qvec_csv
FROM v ORDER BY vec_id
"""


def _q_embedding_norms(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round(F.sqrt(F.aggregate(vec, F.lit(0.0),
                                   lambda a, v: a + v * v)), 6).alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


_SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       CAST(label AS BIGINT) AS label,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])),
             6) AS l2_norm,
       CAST(len(embedding) AS BIGINT) AS dim
FROM embeddings
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing: opaque binary payload + typed metadata
# ---------------------------------------------------------------------------
def _q_multimodal_meta(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")  # stand-in binary column
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("payload_bytes"),
        (F.col("n_chars") % 640).cast("long").alias("width"),
        (F.col("n_chars") % 480).cast("long").alias("height"),
        F.md5(F.col("text")).alias("payload_md5"),
    )


_SQL_MULTIMODAL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
       CAST(n_chars % 640 AS BIGINT) AS width,
       CAST(n_chars % 480 AS BIGINT) AS height,
       md5(text) AS payload_md5
FROM documents
"""


def _q_xlsx_sheet_csv(spark, sf_dir):
    # E9/F7 fan-out: every document becomes a 2-sheet workbook; one
    # output row per produced CSV, bytes per the reference dialect
    from tool_documentsconverter_spark.operators.xlsx_csv import workbooks_to_csv

    docs = _t(spark, sf_dir, "documents")
    payload = F.format_string(
        '{"sheets":[{"name":"data","rows":[["%s","%s"],["%s",null]]},'
        '{"name":"meta","rows":[["%s"]]}]}',
        F.col("doc_id").cast("string"), F.col("lang"),
        F.col("n_chars").cast("string"), F.col("source"),
    )
    wb = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id").cast("string")).alias("stem"),
        payload.alias("payload"),
    )
    return workbooks_to_csv(wb).select("stem", "csv_name", "csv_text", "status")


_SQL_XLSX = """
SELECT 'doc' || CAST(doc_id AS VARCHAR) AS stem,
       'doc' || CAST(doc_id AS VARCHAR) || '__data.csv' AS csv_name,
       CAST(doc_id AS VARCHAR) || ',' || lang || chr(13) || chr(10)
       || CAST(n_chars AS VARCHAR) || ',' || chr(13) || chr(10) AS csv_text,
       'ok' AS status
FROM documents
UNION ALL
SELECT 'doc' || CAST(doc_id AS VARCHAR) AS stem,
       'doc' || CAST(doc_id AS VARCHAR) || '__meta.csv' AS csv_name,
       source || chr(13) || chr(10) AS csv_text,
       'ok' AS status
FROM documents
"""


# ---------------------------------------------------------------------------
# extraction kernel dispatch + media plumbing (oracle-checked: counts and
# stub features are deterministic functions of the payload construction)
# ---------------------------------------------------------------------------
def _q_media_features(spark, sf_dir):
    # ASCII magics (RIFF/ID3) keep the payload valid UTF-8 so the DuckDB
    # oracle can replay the md5-derived stub dimensions byte-for-byte;
    # the non-UTF8 magics (jpeg/png) are covered by tests/test_operators_misc
    from tool_documentsconverter_spark.operators.multimodal import (
        extract_media_features,
    )

    return (
        extract_media_features(_media_table(spark, sf_dir), use_stub=True)
        .orderBy("media_id")
    )


# replay of operators/multimodal.py:_decode_stub: width = 16 + digest[0],
# height = 16 + digest[1] (both digest bytes < 256, so the %640/%480 in
# the stub are identity); digest bytes come from the md5 hex pairs
def _media_table(spark, sf_dir):
    """UTF-8 text payloads with ASCII magics — the construction the
    media_* oracles replay with DuckDB's md5(string)."""
    docs = _t(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("RIFF"))
        .when(F.col("doc_id") % 3 == 1, F.lit("ID3"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(magic, F.col("text")), "UTF-8").alias("payload"),
    )


# shared oracle prefix for every media_* query: payload construction +
# hex digest + the _decode_stub dimension/duration bytes, decoded with
# CAST('0x'||pair AS INTEGER)
_SQL_MEDIA_STUB_CTE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'RIFF' WHEN 1 THEN 'ID3' ELSE '' END
         || text AS payload,
         CASE doc_id % 3 WHEN 0 THEN 'riff' WHEN 1 THEN 'mp3'
              ELSE 'unknown' END AS kind
  FROM documents
), h AS (
  SELECT media_id, kind, md5(payload) AS hx,
         CAST(octet_length(encode(payload)) AS BIGINT) AS payload_bytes
  FROM m
), b AS (
  SELECT media_id, kind, hx, payload_bytes,
         16 + CAST('0x' || substr(hx, 1, 2) AS INTEGER) AS w,
         16 + CAST('0x' || substr(hx, 3, 2) AS INTEGER) % 480 AS h,
         1000 + CAST('0x' || substr(hx, 5, 2) AS INTEGER) * 250
             AS duration_ms
  FROM h
)
"""

_SQL_MEDIA_FEATURES = _SQL_MEDIA_STUB_CTE + """
SELECT media_id, kind,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       'STUB' AS mode,
       payload_bytes,
       hx AS payload_md5,
       'ok' AS status
FROM b ORDER BY media_id
"""


def _q_media_resize(spark, sf_dir):
    """Aspect-preserving thumbnail targets over the media table; the
    integer-only fit_within math is replayed verbatim by the oracle."""
    from tool_documentsconverter_spark.operators.multimodal import resize_media

    return (
        resize_media(_media_table(spark, sf_dir), max_side=100,
                     use_stub=True)
        .select("media_id", "kind", "width", "height",
                "out_width", "out_height", "status")
        .orderBy("media_id")
    )


_SQL_MEDIA_RESIZE = _SQL_MEDIA_STUB_CTE + """
SELECT media_id, kind,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(CASE WHEN greatest(w, h) <= 100 THEN w
                 ELSE greatest(1, w * 100 // greatest(w, h)) END
            AS INTEGER) AS out_width,
       CAST(CASE WHEN greatest(w, h) <= 100 THEN h
                 ELSE greatest(1, h * 100 // greatest(w, h)) END
            AS INTEGER) AS out_height,
       'ok' AS status
FROM b ORDER BY media_id
"""


def _q_frame_sample(spark, sf_dir):
    """Frame-sampling fan-out: 4 evenly-spaced frames per asset (one
    Arrow stage multiplies rows 1 -> n_frames)."""
    from tool_documentsconverter_spark.operators.multimodal import sample_frames

    return (
        sample_frames(_media_table(spark, sf_dir), n_frames=4)
        .select("media_id", "frame_idx", "offset_ms", "frame_md5", "status")
        .orderBy("media_id", "frame_idx")
    )


_SQL_FRAME_SAMPLE = _SQL_MEDIA_STUB_CTE + """
SELECT media_id,
       CAST(k AS INTEGER) AS frame_idx,
       CAST(k * duration_ms // 4 AS BIGINT) AS offset_ms,
       md5(hx || ':' || k) AS frame_md5,
       'ok' AS status
FROM b, LATERAL unnest(range(0, 4)) AS u(k)
ORDER BY media_id, frame_idx
"""


def _q_media_headers(spark, sf_dir):
    """Stdlib image-header decode (use_stub="stdlib" PINS the
    header-parse+hash-fallback decoder — the oracle replays both the
    id->dims formula and the junk-row hash math, so the query must not
    probe Pillow, which would fail the junk rows): 200 media assets
    whose payloads are VALID container bytes built with known
    dimensions derived from the id.  A pass proves the parser reads
    back exactly what the container writer encoded — true dims for
    real image formats, hash-stub only for the junk rows
    (operators/multimodal.py parse_image_header)."""
    from tool_documentsconverter_spark.operators.multimodal import (
        extract_media_features,
    )
    from tool_documentsconverter_spark.sources.transcripts import (
        make_gif_bytes,
        make_jpeg_bytes,
        make_png_bytes,
    )

    rows = []
    for i in range(200):
        w, h = 16 + (i * 7) % 200, 16 + (i * 13) % 150
        if i % 7 == 3:  # junk row: exercises the hash-stub fallback
            rows.append((i, f"JUNKjunk-{i}".encode()))
        elif i % 3 == 0:
            rows.append((i, make_png_bytes(w, h)))
        elif i % 3 == 1:
            rows.append((i, make_jpeg_bytes(w, h)))
        else:
            rows.append((i, make_gif_bytes(w, h)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return (
        extract_media_features(df, use_stub="stdlib")
        .select("media_id", "kind", "width", "height", "mode", "status")
        .orderBy("media_id")
    )


# the id->dims construction formula, plus the md5 hash-stub replay for
# the junk rows (their payloads are ASCII, so DuckDB's md5(VARCHAR)
# reproduces _decode_stub: width = 16 + byte0, height = 16 + byte1 —
# both digest bytes < 256, the stub's %640/%480 are identity)
_SQL_MEDIA_HEADERS = """
SELECT i AS media_id,
       CASE WHEN i % 7 = 3 THEN 'unknown'
            WHEN i % 3 = 0 THEN 'png'
            WHEN i % 3 = 1 THEN 'jpeg'
            ELSE 'gif' END AS kind,
       CAST(CASE WHEN i % 7 = 3
                 THEN 16 + CAST('0x' || substr(md5('JUNKjunk-' || i), 1, 2)
                               AS INTEGER)
                 ELSE 16 + (i * 7) % 200 END AS INTEGER) AS width,
       CAST(CASE WHEN i % 7 = 3
                 THEN 16 + CAST('0x' || substr(md5('JUNKjunk-' || i), 3, 2)
                               AS INTEGER) % 480
                 ELSE 16 + (i * 13) % 150 END AS INTEGER) AS height,
       CASE WHEN i % 7 = 3 THEN 'STUB'
            WHEN i % 3 = 2 THEN 'P'
            ELSE 'RGB' END AS mode,
       'ok' AS status
FROM range(0, 200) t(i)
ORDER BY media_id
"""


def _q_media_audio(spark, sf_dir):
    """Audio container headers (WAV RIFF fmt chunk / FLAC STREAMINFO /
    MP3 frame header with ID3v2 skip): 200 assets whose payloads are
    VALID container bytes built from id-derived parameters, plus junk
    rows that must isolate as failed.  A pass proves the pure-stdlib
    parser reads back exactly what the writers encoded — real header
    fields, no decode stub (operators/multimodal.py
    parse_audio_header)."""
    from tool_documentsconverter_spark.operators.multimodal import (
        extract_audio_features,
    )
    from tool_documentsconverter_spark.sources.transcripts import (
        make_flac_bytes,
        make_mp3_bytes,
        make_wav_bytes,
    )

    rows = []
    for i in range(200):
        if i % 5 == 4:  # junk row: failure isolation
            rows.append((i, f"NOISEnoise-{i}".encode()))
        elif i % 3 == 0:
            rows.append((i, make_wav_bytes(
                (8000, 16000, 44100, 48000)[i % 4], 1 + i % 2,
                8 + 8 * ((i // 3) % 3), 1000 + (i * 37) % 5000)))
        elif i % 3 == 1:
            rows.append((i, make_flac_bytes(
                (44100, 48000, 96000)[(i // 3) % 3], 1 + i % 2,
                (16, 24)[(i // 2) % 2], 1000 + (i * 53) % 100000)))
        else:
            rows.append((i, make_mp3_bytes(
                (64, 128, 192, 320)[(i // 3) % 4],
                (44100, 48000, 32000)[(i // 5) % 3], 1 + i % 2,
                5 + i % 7, with_id3=(i % 2 == 0))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return (
        extract_audio_features(df)
        .select("media_id", "kind", "sample_rate", "channels",
                "bits_per_sample", "duration_ms", "payload_bytes", "status")
        .orderBy("media_id")
    )


# replay of the id->parameters construction AND the parser's integer
# duration math: wav = data_bytes*1000 // byte_rate; flac =
# total_samples*1000 // rate; mp3 = audio_bytes*8000 // bitrate_bps
# with frame_size = 144*bitrate_bps // rate and a 20-byte ID3 tag on
# even ids.  payload_bytes replays the writers' exact layout
# (44+data for RIFF/WAVE, 42 for the fLaC STREAMINFO file,
# tag+frames for mp3).
_SQL_MEDIA_AUDIO = """
WITH p AS (
  SELECT i,
         CASE WHEN i % 5 = 4 THEN 'junk'
              WHEN i % 3 = 0 THEN 'wav'
              WHEN i % 3 = 1 THEN 'flac'
              ELSE 'mp3' END AS k,
         1 + i % 2 AS ch,
         CASE i % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    WHEN 2 THEN 44100 ELSE 48000 END AS wav_sr,
         8 + 8 * ((i // 3) % 3) AS wav_bits,
         1000 + (i * 37) % 5000 AS wav_ns,
         CASE (i // 3) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                           ELSE 96000 END AS flac_sr,
         CASE (i // 2) % 2 WHEN 0 THEN 16 ELSE 24 END AS flac_bits,
         1000 + (i * 53) % 100000 AS flac_total,
         CASE (i // 3) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128
                           WHEN 2 THEN 192 ELSE 320 END AS mp3_br,
         CASE (i // 5) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                           ELSE 32000 END AS mp3_sr,
         5 + i % 7 AS mp3_nf,
         CASE WHEN i % 2 = 0 THEN 20 ELSE 0 END AS id3
  FROM range(0, 200) t(i)
), d AS (
  SELECT *,
         ch * wav_bits // 8 AS wav_ba,
         (144 * mp3_br * 1000) // mp3_sr AS mp3_fs
  FROM p
)
SELECT i AS media_id,
       CASE WHEN k = 'junk' THEN 'unknown' ELSE k END AS kind,
       CAST(CASE k WHEN 'wav' THEN wav_sr WHEN 'flac' THEN flac_sr
                   WHEN 'mp3' THEN mp3_sr END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN k = 'junk' THEN NULL ELSE ch END
            AS INTEGER) AS channels,
       CAST(CASE k WHEN 'wav' THEN wav_bits WHEN 'flac' THEN flac_bits
            END AS INTEGER) AS bits_per_sample,
       CAST(CASE k
              WHEN 'wav' THEN (wav_ns * wav_ba * 1000)
                              // (wav_sr * wav_ba)
              WHEN 'flac' THEN flac_total * 1000 // flac_sr
              WHEN 'mp3' THEN (mp3_nf * mp3_fs) * 8000 // (mp3_br * 1000)
            END AS BIGINT) AS duration_ms,
       CAST(CASE k
              WHEN 'wav' THEN 44 + wav_ns * wav_ba
              WHEN 'flac' THEN 42
              WHEN 'mp3' THEN id3 + mp3_nf * mp3_fs
              ELSE length('NOISEnoise-' || i)
            END AS BIGINT) AS payload_bytes,
       CASE WHEN k = 'junk' THEN 'failed' ELSE 'ok' END AS status
FROM d ORDER BY media_id
"""


def _q_extract_dispatch(spark, sf_dir):
    from tool_documentsconverter_spark.operators.extract import extract
    from tool_documentsconverter_spark.sources.transcripts import synth_transcripts

    df = synth_transcripts(spark, 500)
    out = extract(df, hint_col="fmt_hint")
    return (
        out.groupBy("fmt", "status")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("fmt", "status")
    )


# replays the deterministic payload construction of
# sources/transcripts.py:payload_for (fixtures mix, i % 10 cycle with
# the i % 20 == 19 legacy-.doc case); status: only the declared-doc
# garbage rows (P9) fail
_SQL_EXTRACT_DISPATCH = """
WITH t AS (SELECT range AS i FROM range(500)),
c AS (
  SELECT CASE
           WHEN i % 10 IN (2, 3, 4, 5) THEN 'docx'
           WHEN i % 10 = 6 THEN 'pdf'
           WHEN i % 10 = 7 THEN 'html'
           WHEN i % 10 = 8 THEN 'doc'
           WHEN i % 20 = 19 THEN 'doc'
           ELSE 'text' END AS fmt,
         CASE WHEN i % 10 = 8 THEN 'failed' ELSE 'ok' END AS status
  FROM t
)
SELECT fmt, status, count(*) AS cnt
FROM c GROUP BY fmt, status ORDER BY fmt, status
"""


def _q_extract_binary(spark, sf_dir):
    # binary-document path: bytes payloads with magic-byte dispatch
    from tool_documentsconverter_spark.ole import make_min_doc_bytes
    from tool_documentsconverter_spark.operators.extract_binary import (
        extract_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    doc_payload = make_min_doc_bytes("Binary legacy doc.\rBody line.")
    payload = (
        F.when(F.col("doc_id") % 3 == 0,
               F.encode(F.concat(F.lit("%PDF-1.4\n1 0 obj\nstream\nBT ("),
                                 F.substring("text", 1, 40),
                                 F.lit(") Tj ET\nendstream\n")), "UTF-8"))
        .when(F.col("doc_id") % 3 == 1, F.lit(doc_payload))
        .otherwise(F.encode(F.col("text"), "UTF-8"))
    )
    media = docs.select(F.col("doc_id"), payload.alias("payload"))
    out = extract_documents(media)
    return (
        out.groupBy("status").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("status")
    )


# every synthesized binary payload (PDF for doc_id%3=0, legacy OLE2 .doc
# for doc_id%3=1, else plain text) converts successfully — the expected
# status distribution is a deterministic function of the construction
_SQL_EXTRACT_BINARY = """
SELECT 'ok' AS status, count(*) AS cnt FROM documents ORDER BY status
"""


def _q_docx_rich(spark, sf_dir):
    """E3 pandoc-class DOCX richness: every document becomes a real
    zipped .docx with numbering.xml lists (ordered + nested bullets),
    rels-resolved hyperlinks, an anchor link and split bold/italic
    runs; the converted Markdown is returned VERBATIM so the oracle's
    rebuilt template is compared byte-for-byte via the value hash."""
    import pyarrow as pa

    from tool_documentsconverter_spark import kernels as K
    from tool_documentsconverter_spark.sources.transcripts import (
        make_rich_docx_bytes,
    )

    # fan_out: the documents table is one parquet file -> one scan
    # partition, which ran this whole per-row build+convert loop on a
    # single core (guide §2.6 idle capacity); no-op on a real
    # multi-split corpus scan
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id"))

    def conv(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            mds = [K.convert_docx_bytes(f"rd{i}", make_rich_docx_bytes(i))
                   for i in ids]
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(ids, type=pa.int64()),
                "md": pa.array(mds, type=pa.string()),
            })

    return docs.mapInArrow(conv, "doc_id long, md string").orderBy("doc_id")


# byte-exact rebuild of sources/transcripts.py:rich_docx_expected_md —
# the full converted Markdown, list markers, nesting indents, emphasis
# and link spans included
_SQL_DOCX_RICH = """
SELECT doc_id,
       '# rd' || doc_id || chr(10) || chr(10)
       || '# Rich doc ' || doc_id || chr(10) || chr(10)
       || '1. Step one of ' || doc_id || chr(10)
       || '2. Step two' || chr(10)
       || '3. Step three' || chr(10)
       || '- alpha ' || doc_id || chr(10)
       || '    - beta nested' || chr(10)
       || '- gamma' || chr(10) || chr(10)
       || 'plain **bold ' || doc_id || '** mid *ital* ***both***'
       || chr(10) || chr(10)
       || 'See [**site ' || doc_id || '**](https://example.com/d'
       || doc_id || ') and [jump](#sec1)' || chr(10) || chr(10) AS md
FROM documents ORDER BY doc_id
"""


def _q_pdf_layout(spark, sf_dir):
    """Marker-class reading order: every document becomes a two-column
    PDF whose stream writes the RIGHT column first; the extracted text
    must come out in reading order (y desc, x asc), compared verbatim
    against the oracle's rebuilt template."""
    import pyarrow as pa

    from tool_documentsconverter_spark import kernels as K
    from tool_documentsconverter_spark.sources.transcripts import (
        make_two_column_pdf,
    )

    # fan_out: single-file scan -> one partition otherwise (§2.6)
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id"))

    def conv(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = [K.extract_pdf_text(make_two_column_pdf(i)) for i in ids]
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            })

    return docs.mapInArrow(conv, "doc_id long, text string").orderBy("doc_id")


# byte-exact rebuild of the reading-ordered extraction of
# sources/transcripts.py:make_two_column_pdf (stream order is right
# column first; reading order interleaves rows left-to-right)
_SQL_PDF_LAYOUT = """
SELECT doc_id,
       'Left top ' || doc_id || chr(10)
       || 'Right top ' || doc_id || chr(10)
       || 'Left bottom' || chr(10) || 'Right bottom' AS text
FROM documents ORDER BY doc_id
"""


def _q_md_pdf_roundtrip(spark, sf_dir):
    """S8 sink consistency: wrap every document to Markdown, render the
    minimal deterministic PDF, re-extract the text with the repo's own
    PDF reader, and verify byte equality against the SOURCE — all
    documents, any length, any script (multi-page output joins
    newline-exact via the %cont continuation marker; non-latin-1 text
    rides the Identity-H CID hex path).  The oracle predicts
    roundtrip_ok (now universally true — that universality is the
    round-4 contract being checked) and the page count from the text
    alone."""
    import pyarrow as pa

    from tool_documentsconverter_spark import kernels as K

    # fan_out: single-file scan -> one partition otherwise (§2.6)
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text"))

    def check(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            oks, pages = [], []
            for text in texts:
                md = K.wrap_text_md("d", text or "")
                pdf = K.markdown_to_pdf_bytes(md)
                # force_stdlib: the byte-exact contract belongs to THIS
                # writer/extractor pair — pdfminer (when installed)
                # produces correct but non-byte-contractual layout text
                back = K.extract_pdf_text(pdf.decode("latin-1"),
                                          force_stdlib=True)
                oks.append(back == md)  # byte-exact vs the SOURCE
                pages.append(md.count("\n") // K._PDF_PAGE_LINES + 1)
            yield pa.RecordBatch.from_pydict({
                "doc_id": pa.array(ids, type=pa.int64()),
                "roundtrip_ok": pa.array(oks, type=pa.bool_()),
                "n_pages": pa.array(pages, type=pa.int32()),
            })

    return docs.mapInArrow(
        check, "doc_id long, roundtrip_ok boolean, n_pages int"
    ).orderBy("doc_id")


# wrap_text_md adds exactly 5 newlines around the text; the PDF paginates
# at 46 lines (kernels._PDF_PAGE_LINES).  Since round 4 the round trip is
# byte-exact for EVERY document — multi-page output re-joins newline-exact
# through the %cont continuation marker and non-latin-1 text survives via
# the Identity-H CID hex path — so the oracle predicts roundtrip_ok TRUE
# universally; the n_pages prediction keeps the page-boundary math honest
# (the engine side still physically renders and re-extracts every row;
# tests/test_md_pdf.py pins the multi-page and CJK equality cases).
_SQL_MD_PDF = """
SELECT doc_id,
       TRUE AS roundtrip_ok,
       CAST((5 + length(coalesce(text, ''))
             - length(replace(coalesce(text, ''), chr(10), ''))) // 46
            + 1 AS INTEGER) AS n_pages
FROM documents ORDER BY doc_id
"""


def _q_lsh_ann(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    # ORACLE configuration: 1 band x 4 bits (planes 0..3, identical to
    # the pre-banding signature) with the bucket cap off, so the DuckDB
    # twin below replays the join exhaustively.  Production callers use
    # the defaults (8 bands x 16 bits, max_bucket on) — see lsh_topk's
    # docstring and tests/test_similarity.py for the recall evidence.
    return SIM.lsh_topk(emb, queries, k=5, n_bands=1, bits_per_band=4,
                        dim=64, max_bucket=None).orderBy(
        "query_id", "rank"
    )


# replay of operators/similarity.py:hyperplane_sign — the hyperplanes are
# md5-derived precisely so the oracle can recompute the signatures:
# weight(p, d) = hexval(md5(p || ':' || d)[0]) - 7.5, bit = sign of the
# (in-order) dot product, signature = 4 concatenated bits
_SQL_ANN_LSH = """
WITH pw AS (
  SELECT p,
         list(CASE WHEN substr(h, 1, 1) BETWEEN '0' AND '9'
                   THEN ascii(substr(h, 1, 1)) - 48
                   ELSE ascii(substr(h, 1, 1)) - 87 END - 7.5
              ORDER BY d) AS ws
  FROM (
    SELECT p, d, md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)) AS h
    FROM range(4) t(p), range(64) u(d)
  ) GROUP BY p
), sig AS (
  SELECT e.vec_id,
         string_agg(
           CASE WHEN list_sum(list_transform(range(1, 65),
                  i -> e.embedding[i]::DOUBLE * pw.ws[i])) >= 0
                THEN '1' ELSE '0' END, '' ORDER BY pw.p) AS sig
  FROM embeddings e, pw
  GROUP BY e.vec_id
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(
           list_dot_product(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[])
           / (sqrt(list_dot_product(qe.embedding::DOUBLE[],
                                    qe.embedding::DOUBLE[]))
              * sqrt(list_dot_product(ce.embedding::DOUBLE[],
                                      ce.embedding::DOUBLE[]))), 6) AS score
  FROM sig q
  JOIN sig c ON q.sig = c.sig
  JOIN embeddings qe ON qe.vec_id = q.vec_id
  JOIN embeddings ce ON ce.vec_id = c.vec_id
  WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC)
            AS INTEGER) AS rank,
       score
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank
"""


_IVF_CENTROID_CACHE: dict = {}


def _q_ivf_ann(spark, sf_dir):
    # IVF scale path: full probe (n_probe == n_cells) makes the result
    # EQUAL to the exact brute-force top-k, so the DuckDB cosine oracle
    # checks it; reduced probes trade recall for candidates (tested in
    # tests/test_similarity.py).  The coarse quantizer is fit ONCE per
    # (dataset, n_cells) and reused — the production shape: the model
    # is an artifact, not a per-query cost.
    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, 8)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = SIM.fit_ivf_centroids(emb, n_cells=8)
    queries = emb.where(F.col("vec_id") < 3)
    return SIM.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8,
                        centroids=_IVF_CENTROID_CACHE[key])


def _q_ivf_quantized(spark, sf_dir):
    """IVF over int8-code posting lists (quantize_embeddings composed
    with the IVF probe plan — operators/similarity.py
    ivf_quantized_topk): the 10^12-row serving shape where the index
    artifact is (cell, scale, codes), 4x smaller than float32.  Full
    probe (n_probe == n_cells) makes the result EQUAL to the exact
    quantized brute-force top-k, so the DuckDB oracle replays
    quantize -> dequantize -> cosine -> top-k; production-probe recall
    vs the float exact path is pinned in tests/test_similarity.py and
    measured in scripts/ann_recall.py."""
    emb = _t(spark, sf_dir, "embeddings")
    key = (sf_dir, 8)
    if key not in _IVF_CENTROID_CACHE:
        _IVF_CENTROID_CACHE[key] = SIM.fit_ivf_centroids(emb, n_cells=8)
    queries = emb.where(F.col("vec_id") < 3)
    return SIM.ivf_quantized_topk(emb, queries, k=5, n_cells=8, n_probe=8,
                                  centroids=_IVF_CENTROID_CACHE[key])


# Quantize -> dequantize replayed inline (same expressions as
# _SQL_EMBEDDING_QUANTIZE), then the _SQL_ANN_BRUTE cosine/top-k over
# the dequantized corpus side; the query side stays float like the
# Spark plan's qvec.
_SQL_ANN_IVF_QUANTIZED = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
  FROM embeddings
), dq AS (
  SELECT vec_id,
         CASE WHEN m = 0 THEN list_transform(e, x -> 0.0)
              ELSE list_transform(
                e, x -> CAST(round(x * 127 / m) AS INTEGER) * m / 127.0)
         END AS dv
  FROM v
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
         round(
           list_dot_product(q.qv, d.dv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(d.dv, d.dv))), 6) AS score
  FROM dq d CROSS JOIN q
  WHERE d.vec_id <> q.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, neighbor_id ASC)
            AS INTEGER) AS rank,
       score
FROM scored
QUALIFY rank <= 5
"""


# ---------------------------------------------------------------------------
# round-6 corpus-curation additions: exact-substring duplication stats,
# winnowing fingerprints, corpus-trained LM perplexity, TF-IDF / BM25


def _q_dup_ngram_stats(spark, sf_dir):
    """Per-document exact-substring duplication fraction (Lee et al.
    2021 suffix-array dedup signal, operators/dedup.py
    dup_ngram_stats): distinct word 5-grams per doc, the share of them
    occurring in >= 2 distinct documents.  One gram-partition window
    COUNT + one map-side-combinable doc rollup — no joins, no pairs,
    mega-cluster-immune by construction."""
    docs = _t(spark, sf_dir, "documents")
    return D.dup_ngram_stats(docs, "doc_id", "text", n=5).orderBy("doc_id")


_SQL_DUP_NGRAM_STATS = """
WITH toks AS (
  SELECT doc_id,
         string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i + 1, i + 5), ' ') AS shingle
  FROM toks,
       LATERAL unnest(range(0, greatest(len(t) - 5, 0) + 1)) AS u(i)
), tagged AS (
  SELECT doc_id, count(*) OVER (PARTITION BY shingle) AS docs_with
  FROM sh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_grams,
       round(CAST(sum(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS dup_frac
FROM tagged GROUP BY doc_id ORDER BY doc_id
"""


def _q_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003,
    operators/textstats.py winnow_fingerprints): k=3 word-gram md5
    hashes, window w=4 minima, distinct per doc.  Zero-shuffle
    per-row array fold; any >= 6-word shared substring between two
    docs yields an identical fingerprint in both."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return TS.winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).orderBy(
        "doc_id", "fingerprint")


_SQL_WINNOW = """
WITH toks AS (
  SELECT doc_id,
         string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS t
  FROM documents WHERE doc_id < 200
), g AS (
  SELECT doc_id, i,
         md5(array_to_string(list_slice(t, i + 1, i + 3), ' ')) AS h,
         greatest(len(t) - 3, 0) + 1 AS n_g
  FROM toks,
       LATERAL unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)
), sel AS (
  SELECT doc_id, i, n_g,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM g
)
SELECT DISTINCT doc_id, fp AS fingerprint
FROM sel WHERE i <= greatest(n_g - 4, 0)
ORDER BY doc_id, fingerprint
"""


def _q_lm_perplexity(spark, sf_dir):
    """Corpus-trained add-one bigram-LM scoring (the CCNet quality
    signal, operators/textstats.py lm_perplexity): per-doc mean
    -ln p(w2|w1) and perplexity under a model counted from the corpus
    itself in the same plan — window COUNTs attach the model to
    occurrence rows, no model join, no driver-side state."""
    docs = _t(spark, sf_dir, "documents")
    return TS.lm_perplexity(docs, "doc_id", "text").orderBy("doc_id")


_SQL_LM_PERPLEXITY = """
WITH wrds AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS ws
  FROM documents
), bg AS (
  SELECT doc_id, ws[i + 1] AS w1, ws[i + 2] AS w2
  FROM wrds,
       LATERAL unnest(range(0, greatest(len(ws) - 1, 0))) AS u(i)
  WHERE len(ws) >= 2
), v AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(ws) AS w FROM wrds)
), cnt AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY w1, w2) AS c2,
         count(*) OVER (PARTITION BY w1) AS c1
  FROM bg
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((c2 + 1) / (c1 + v))), 6) AS avg_nll,
       round(exp(avg(-ln((c2 + 1) / (c1 + v)))), 4) AS ppl
FROM cnt CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
"""


def _q_tfidf_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smooth_idf variant,
    operators/ranking.py tfidf_topk_terms): one map-side-combinable
    (doc, term) rollup, df via term-partition window, bounded
    per-doc top-k window — no global sort, no df-table join."""
    docs = _t(spark, sf_dir, "documents")
    return R.tfidf_topk_terms(docs, "doc_id", "text", k=3).orderBy(
        "doc_id", "rank")


_SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'),
           x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln((n_docs + 1)
                        / (count(*) OVER (PARTITION BY term) + 1)) + 1),
               6) AS score
  FROM tf CROSS JOIN n
), ranked AS (
  SELECT doc_id, term,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, term) AS INTEGER)
           AS rank,
         score
  FROM scored
)
SELECT doc_id, term, rank, score FROM ranked
WHERE rank <= 3 ORDER BY doc_id, rank
"""


def _q_bm25_topk(spark, sf_dir):
    """BM25 top-10 for the fixed bag {scan, table, window}
    (operators/ranking.py bm25_topk): zero token explode — per-doc
    tfs are codegen size(filter(...)) on the scan, corpus stats are
    ONE broadcast single-row aggregate, top-k is
    TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    return R.bm25_topk(docs, ["scan", "table", "window"],
                       "doc_id", "text", topk=10).orderBy("rank")


# terms sorted ascending = the operator's canonical order; decimal
# literals are cast to DOUBLE so DuckDB's decimal arithmetic cannot
# diverge from Spark's double arithmetic (round-6 then absorbs ulp)
_SQL_BM25 = """
WITH base AS (
  SELECT doc_id,
         CAST(len(ws) AS DOUBLE) AS dl,
         CAST(len(list_filter(ws, x -> x = 'scan')) AS DOUBLE) AS tf_0,
         CAST(len(list_filter(ws, x -> x = 'table')) AS DOUBLE) AS tf_1,
         CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf_2
  FROM (
    SELECT doc_id,
           list_filter(
             string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'),
             x -> x <> '') AS ws
    FROM documents)
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
         sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
         sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
  FROM base
), scored AS (
  SELECT doc_id,
         round(
           ln(1 + (n_docs - df_0 + CAST(0.5 AS DOUBLE))
                  / (df_0 + CAST(0.5 AS DOUBLE)))
             * (tf_0 * (CAST(1.2 AS DOUBLE) + 1)
                / (tf_0 + CAST(1.2 AS DOUBLE)
                   * (1 - CAST(0.75 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE) * dl / avgdl)))
           + ln(1 + (n_docs - df_1 + CAST(0.5 AS DOUBLE))
                    / (df_1 + CAST(0.5 AS DOUBLE)))
             * (tf_1 * (CAST(1.2 AS DOUBLE) + 1)
                / (tf_1 + CAST(1.2 AS DOUBLE)
                   * (1 - CAST(0.75 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE) * dl / avgdl)))
           + ln(1 + (n_docs - df_2 + CAST(0.5 AS DOUBLE))
                    / (df_2 + CAST(0.5 AS DOUBLE)))
             * (tf_2 * (CAST(1.2 AS DOUBLE) + 1)
                / (tf_2 + CAST(1.2 AS DOUBLE)
                   * (1 - CAST(0.75 AS DOUBLE)
                      + CAST(0.75 AS DOUBLE) * dl / avgdl))),
           6) AS score
  FROM base CROSS JOIN stats
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
         AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


def _synth_multiline(spark, sf_dir, punct: bool) -> DataFrame:
    """documents.text carries no newlines (single-line word salad), so
    the line-level queries rebuild each document as a deterministic
    multi-line page, replayed verbatim by the DuckDB oracles (the
    domain_stats precedent): 6-word chunk lines, a 'section {id%7}'
    header shared by ~1/7 of the corpus, a footer shared by every
    document, a second footer on even ids, and (punct=True) C4-style
    terminal punctuation on chunk i where (doc_id+i)%3 != 0 plus
    javascript / lorem-ipsum / curly-brace marker lines on ids
    divisible by 13 / 25 / 17.

    The token array is materialized in its own projection and
    referenced twice downstream (size + the chunk lambda) so Catalyst
    does not re-split the document once per chunk."""
    # fan_out BEFORE the page build: the split+chunk+concat projection
    # is the heavy narrow stage and would otherwise sit below the
    # consumers' exchanges on the single-file scan's 1-2 partitions
    # (round-8 §2.6 discipline; measured 0.88s -> 0.25s noop at sf1.0)
    docs = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    step = docs.select(
        "doc_id",
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))),
                r"\s+").alias("_t"),
    )
    toks = F.col("_t")
    nl = F.greatest(F.lit(1), F.ceil(F.size(toks) / F.lit(6)).cast("int"))
    did = F.col("doc_id")
    empty = F.array().cast("array<string>")
    if punct:
        chunk = F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: F.concat(
                F.array_join(F.slice(toks, i * 6 + 1, 6), " "),
                F.when((did + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
            ),
        )
        extras = F.concat(
            F.when(did % 13 == 0, F.array(
                F.lit("please enable javascript to view this page."))
                ).otherwise(empty),
            F.when(did % 25 == 0, F.array(
                F.lit("lorem ipsum dolor sit amet."))).otherwise(empty),
            F.when(did % 17 == 0, F.array(
                F.lit("var config = { enabled: true };"))).otherwise(empty),
        )
    else:
        chunk = F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: F.array_join(F.slice(toks, i * 6 + 1, 6), " "),
        )
        extras = empty
    lines = F.concat(
        F.array(F.concat(F.lit("section "), (did % 7).cast("string"))),
        chunk,
        extras,
        F.array(F.lit("subscribe to our newsletter")),
        F.when(did % 2 == 0, F.array(F.lit("follow us on social media"))
               ).otherwise(empty),
    )
    return step.select("doc_id", F.concat_ws("\n", lines).alias("text"))


# shared synthetic-page CTE for the line-level oracles; {chunk} and
# {extras} vary between the plain and the punctuated construction
_SQL_SYNTH_LINES = """
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS t
  FROM documents
), n AS (
  SELECT doc_id, t,
         greatest(1, CAST(ceil(len(t) / 6.0) AS INTEGER)) AS nl
  FROM base
), lines AS (
  SELECT doc_id,
         ['section ' || CAST(doc_id % 7 AS VARCHAR)]
         || list_transform(range(0, nl), i -> {chunk})
         {extras}|| ['subscribe to our newsletter']
         || CASE WHEN doc_id % 2 = 0 THEN ['follow us on social media']
                 ELSE CAST([] AS VARCHAR[]) END
           AS ls
  FROM n
)"""

_SQL_CHUNK_PLAIN = "array_to_string(list_slice(t, i * 6 + 1, i * 6 + 6), ' ')"
_SQL_CHUNK_PUNCT = (
    _SQL_CHUNK_PLAIN
    + " || CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END"
)
_SQL_EXTRAS_PUNCT = """|| CASE WHEN doc_id % 13 = 0
                 THEN ['please enable javascript to view this page.']
                 ELSE CAST([] AS VARCHAR[]) END
         || CASE WHEN doc_id % 25 = 0
                 THEN ['lorem ipsum dolor sit amet.']
                 ELSE CAST([] AS VARCHAR[]) END
         || CASE WHEN doc_id % 17 = 0
                 THEN ['var config = { enabled: true };']
                 ELSE CAST([] AS VARCHAR[]) END
         """


def _q_line_dedup(spark, sf_dir):
    """Corpus-level line deduplication (CCNet / RefinedWeb boilerplate
    removal, operators/dedup.py line_dedup) over the synthesized
    multi-line corpus: any line whose normalized form appears in >= 2
    distinct documents (the shared section headers and footers, plus
    any naturally colliding chunk) is dropped from every document and
    the survivors are reassembled in order.  One md5(line) window
    exchange + one per-doc rollup — no joins, no pairs."""
    return D.line_dedup(
        _synth_multiline(spark, sf_dir, punct=False),
        "doc_id", "text", min_docs=2,
    ).orderBy("doc_id")


_SQL_LINE_DEDUP = _SQL_SYNTH_LINES.format(
    chunk=_SQL_CHUNK_PLAIN, extras="") + """
, lrows AS (
  SELECT doc_id, CAST(k AS INTEGER) AS pos,
         ls[CAST(k + 1 AS INTEGER)] AS line
  FROM lines, LATERAL unnest(range(0, len(ls))) AS u(k)
), ranked AS (
  SELECT doc_id, pos, line, md5(lower(trim(line))) AS h,
         dense_rank() OVER (PARTITION BY md5(lower(trim(line)))
                            ORDER BY doc_id) AS dr
  FROM lrows
), tagged AS (
  SELECT doc_id, pos, line,
         trim(line) <> '' AND max(dr) OVER (PARTITION BY h) >= 2 AS dropl
  FROM ranked
)
SELECT doc_id,
       coalesce(
         array_to_string(
           list_transform(
             list_sort(list({'pos': pos, 'line': line})
                       FILTER (WHERE NOT dropl)),
             s -> struct_extract(s, 'line')),
           chr(10)), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN dropl THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round(CAST(sum(CASE WHEN dropl THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS dropped_frac
FROM tagged GROUP BY doc_id ORDER BY doc_id
"""


def _q_c4_filters(spark, sf_dir):
    """C4 cleaning rules (Raffel et al. 2020 §2.2,
    operators/textstats.py c4_quality_filters) over the punctuated
    synthetic corpus: terminal-punctuation + >=5-word + no-javascript
    line filter, sentence floor, lorem-ipsum and curly-brace page
    flags.  Zero shuffles — every signal is a codegen'd higher-order
    function over the per-row line array."""
    return TS.c4_quality_filters(
        _synth_multiline(spark, sf_dir, punct=True), "doc_id", "text"
    ).orderBy("doc_id")


_SQL_C4_FILTERS = _SQL_SYNTH_LINES.format(
    chunk=_SQL_CHUNK_PUNCT, extras=_SQL_EXTRAS_PUNCT) + r"""
, flt AS (
  SELECT doc_id, ls,
         list_filter(ls, x -> regexp_matches(trim(x), '[.!?"]$')
                        AND len(string_split_regex(trim(x), '\s+')) >= 5
                        AND NOT contains(lower(x), 'javascript')) AS kept
  FROM lines
), agg AS (
  SELECT doc_id,
         array_to_string(ls, chr(10)) AS full_text,
         array_to_string(kept, chr(10)) AS clean_text,
         CAST(len(ls) AS INTEGER) AS n_lines,
         CAST(len(kept) AS INTEGER) AS n_kept_lines
  FROM flt
)
SELECT doc_id, clean_text, n_lines, n_kept_lines,
       CAST(len(string_split_regex(clean_text, '[.!?]')) - 1 AS INTEGER)
         AS n_sentences,
       contains(lower(full_text), 'lorem ipsum') AS has_lorem,
       contains(full_text, '{') AS has_brace,
       (CAST(len(string_split_regex(clean_text, '[.!?]')) - 1 AS INTEGER) >= 3
        AND NOT contains(lower(full_text), 'lorem ipsum')
        AND NOT contains(full_text, '{')) AS keep
FROM agg ORDER BY doc_id
"""


def _q_fuzzy_dedup_keep(spark, sf_dir):
    """End-to-end fuzzy dedup (operators/dedup.py dedup_survivors):
    MinHash banding -> LSH candidate pairs -> connected components ->
    keeper = min id per component, joined back onto the corpus
    (cluster table broadcast — the corpus side is never shuffled).
    Filtering kept=true yields the deduplicated corpus; this is the
    composite a production pipeline actually runs."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", n_bands=4)
    clusters = D.cluster_duplicates(pairs)
    return D.dedup_survivors(docs, clusters, "doc_id").orderBy("doc_id")


# same pair generation + reachability CTE as _SQL_DUP_CLUSTERS, but the
# component table is joined back onto the full (filtered) corpus with
# keeper selection instead of being returned on its own
_SQL_FUZZY_KEEP = _SQL_DUP_CLUSTERS.replace(
    """SELECT c.id AS doc_id, c.cluster_id, s.cluster_size
FROM comp c JOIN sizes s USING (cluster_id)
ORDER BY doc_id""",
    """SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       CAST(coalesce(s.cluster_size, 1) AS BIGINT) AS cluster_size,
       (coalesce(c.cluster_id, d.doc_id) = d.doc_id) AS kept
FROM (SELECT doc_id FROM documents WHERE doc_id < 64) d
LEFT JOIN comp c ON c.id = d.doc_id
LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
ORDER BY d.doc_id""")
assert _SQL_FUZZY_KEEP != _SQL_DUP_CLUSTERS  # replace anchor must hold


def _q_warc_extract(spark, sf_dir):
    """CommonCrawl-style WARC ingestion (sources/warc.py read_warc):
    40 synthetic WARC files — warcinfo + 3-5 HTTP response records
    each, half of them per-record-gzip .warc.gz members, some with a
    junk tail that must isolate as ONE failed record — exploded into
    typed record rows in a single Arrow stage.  A pass proves the
    pure-stdlib ISO-28500 parser (record headers, Content-Length
    block framing, HTTP envelope, gzip member walk) reads back
    exactly what the builders encoded; the DuckDB oracle replays the
    id->page construction and hashes the same HTTP bodies."""
    from tool_documentsconverter_spark.sources.warc import (
        make_warc_bytes,
        read_warc,
    )

    rows = []
    for fid in range(40):
        k = 3 + fid % 3
        pages = []
        for r in range(1, k + 1):
            if r % 5 == 4:
                code, body = 404, b"<html><body><h1>404</h1></body></html>"
            else:
                code, body = 200, (
                    f"<html><body><h1>Page {fid}-{r}</h1>"
                    f"<p>alpha beta gamma {fid * 31 + r}</p></body></html>"
                ).encode("ascii")
            pages.append((f"http://site{fid}.example/page{r}", code, body))
        data = make_warc_bytes(pages, compress=(fid % 2 == 0))
        if fid % 7 == 3:
            data += b"GARBAGE-not-a-warc-record"
        rows.append((fid, data))
    df = spark.createDataFrame(rows, "file_id long, payload binary")
    return (
        read_warc(df)
        .select(
            "file_id", "rec_idx", "warc_type", "url", "http_status",
            "mime",
            F.length("body").cast("long").alias("body_len"),
            F.md5("body").alias("body_md5"),
            "status",
        )
        .orderBy("file_id", "rec_idx")
    )


_SQL_WARC_EXTRACT = """
WITH f AS (
  SELECT CAST(fid AS BIGINT) AS fid, 3 + fid % 3 AS k
  FROM range(0, 40) t(fid)
), recs AS (
  SELECT fid, k, 0 AS r FROM f
  UNION ALL
  SELECT fid, k, CAST(u.r AS INTEGER) AS r
  FROM f, LATERAL unnest(range(1, k + 1)) AS u(r)
  UNION ALL
  SELECT fid, k, CAST(k + 1 AS INTEGER) AS r FROM f WHERE fid % 7 = 3
), body AS (
  SELECT fid, k, r,
         CASE WHEN r = 0 THEN 'software: spark-graft' || chr(13) || chr(10)
              WHEN r = k + 1 THEN ''
              WHEN r % 5 = 4 THEN '<html><body><h1>404</h1></body></html>'
              ELSE '<html><body><h1>Page ' || fid || '-' || r ||
                   '</h1><p>alpha beta gamma ' || (fid * 31 + r) ||
                   '</p></body></html>' END AS b
  FROM recs
)
SELECT fid AS file_id,
       CAST(r AS INTEGER) AS rec_idx,
       CASE WHEN r = 0 THEN 'warcinfo'
            WHEN r = k + 1 THEN 'invalid'
            ELSE 'response' END AS warc_type,
       CASE WHEN r = 0 OR r = k + 1 THEN NULL
            ELSE 'http://site' || fid || '.example/page' || r END AS url,
       CASE WHEN r = 0 OR r = k + 1 THEN NULL
            WHEN r % 5 = 4 THEN 404 ELSE 200 END AS http_status,
       CASE WHEN r = 0 OR r = k + 1 THEN NULL
            ELSE 'text/html; charset=utf-8' END AS mime,
       CAST(length(b) AS BIGINT) AS body_len,
       md5(b) AS body_md5,
       CASE WHEN r = k + 1 THEN 'failed' ELSE 'ok' END AS status
FROM body ORDER BY file_id, rec_idx
"""


def _q_bloom_contamination(spark, sf_dir):
    """Bloom-filter decontamination (operators/dedup.py
    bloom_contamination): every 50th document plays the held-out
    benchmark whose 3-shingles set 3 md5 bits each in a 4096-bit
    filter; corpus documents are charged for every shingle whose bits
    are ALL set — false positives included, which is the bloom
    contract the oracle replays via the all-bits-present join.  The
    Spark side embeds the bounded bitset as a codegen string literal:
    zero joins, one map-side-combinable rollup."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return (
        D.bloom_contamination(corpus, bench, "doc_id", "text")
        .orderBy("doc_id")
    )


_SQL_BLOOM_CONTAMINATION = _SQL_SHINGLES_CTE.format(
    where="WHERE doc_id % 50 <> 0") + """
, bt AS (
  SELECT string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS t
  FROM documents WHERE doc_id % 50 = 0
), bsh AS (
  SELECT DISTINCT array_to_string(list_slice(t, i + 1, i + 3), ' ') AS shingle
  FROM bt, LATERAL unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS u(i)
), bbits AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(shingle), 1 + 8 * j, 8) AS BIGINT)
           % 4096 AS bit
  FROM bsh, LATERAL unnest([0, 1, 2]) AS h(j)
), probe AS (
  SELECT doc_id, shingle, j,
         CAST('0x' || substr(md5(shingle), 1 + 8 * j, 8) AS BIGINT)
           % 4096 AS bit
  FROM sh, LATERAL unnest([0, 1, 2]) AS h(j)
), hits AS (
  SELECT doc_id, shingle
  FROM probe JOIN bbits USING (bit)
  GROUP BY doc_id, shingle
  HAVING count(*) = 3
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS flagged_shingles
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


def _q_mixture_resample(spark, sf_dir):
    """Domain-mixture rebalancing (operators/textprep.py
    mixture_resample): uniform target over the `source` domains at a
    0.5 budget — over-represented domains down-sample to the uniform
    share, p_keep caps at 1, the keep decision is a deterministic
    md5 threshold replayed bit-for-bit by the oracle.  Stats are one
    tiny groupBy + a single-row total cross-joined back; the corpus
    is never shuffled (broadcast rejoin, codegen probe)."""
    from tool_documentsconverter_spark.operators.textprep import (
        mixture_resample,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_resample(docs, "source", "doc_id",
                            budget_frac=0.5).orderBy("doc_id")


_SQL_MIXTURE_RESAMPLE = """
WITH stats AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_domain
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_domain) AS BIGINT) AS n, count(*) AS k FROM stats
), pk AS (
  SELECT source, n_domain,
         least(1.0, (0.5 * n / k) / n_domain) AS p
  FROM stats, tot
)
SELECT d.doc_id,
       d.source AS domain,
       p.n_domain,
       round(p.p, 6) AS p_keep,
       (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
          / 4294967296.0 < p.p) AS kept
FROM documents d JOIN pk p USING (source)
ORDER BY doc_id
"""


def _q_url_dedup(spark, sf_dir):
    """Crawl-level exact-URL dedup (operators/web.py extract_links +
    canonical_url + url_dedup): each document carries two synthesized
    anchors — a per-id URL in one of three equivalent spellings
    (uppercase scheme/host + www + :80, trailing slash, #fragment)
    and a hub URL shared by every page — exploded by the codegen href
    regex, canonicalized, and grouped.  The oracle replays the
    construction and the canonicalization regex chain; the href
    extraction itself is pinned by pytest."""
    import tool_documentsconverter_spark.operators.web as W

    docs = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 400)
    i = F.col("doc_id")
    k = (i % 20).cast("string")
    p = (i % 50).cast("string")
    u1 = (
        F.when(i % 3 == 0, F.concat(
            F.lit("HTTP://WWW.Site"), k, F.lit(".example:80/path"), p))
        .when(i % 3 == 1, F.concat(
            F.lit("http://site"), k, F.lit(".example/path"), p, F.lit("/")))
        .otherwise(F.concat(
            F.lit("http://site"), k, F.lit(".example/path"), p,
            F.lit("#frag"), i.cast("string")))
    )
    html = F.concat(
        F.lit('<p>see <a href="'), u1, F.lit('">here</a> and '),
        F.lit("<a href='https://Hub.example:443/root/'>hub</a></p>"),
    )
    links = W.extract_links(docs.select("doc_id", html.alias("html")))
    return (
        W.url_dedup(links, "doc_id", "href")
        .orderBy("canon_url")
    )


_SQL_URL_DEDUP = r"""
WITH u AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'HTTP://WWW.Site' || (doc_id % 20)
                       || '.example:80/path' || (doc_id % 50)
           WHEN 1 THEN 'http://site' || (doc_id % 20)
                       || '.example/path' || (doc_id % 50) || '/'
           ELSE 'http://site' || (doc_id % 20)
                || '.example/path' || (doc_id % 50) || '#frag' || doc_id
         END AS url
  FROM documents WHERE doc_id < 400
  UNION ALL
  SELECT doc_id, 'https://Hub.example:443/root/' AS url
  FROM documents WHERE doc_id < 400
), parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           AS sch,
         regexp_replace(lower(regexp_extract(
              regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
              '^([^/?#]+)', 1)), '^www\.', '') AS hst,
         regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
              '^[^/?#]+', ''), '#.*$', ''), '/+$', '') AS pq
  FROM u
), c AS (
  SELECT doc_id,
         sch || '://'
         || CASE WHEN sch = 'http' THEN regexp_replace(hst, ':80$', '')
                 WHEN sch = 'https' THEN regexp_replace(hst, ':443$', '')
                 ELSE hst END
         || pq AS canon_url
  FROM parts
)
SELECT canon_url,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM c GROUP BY canon_url ORDER BY canon_url
"""


def _q_pagerank(spark, sf_dir):
    """Fixed-point PageRank (operators/web.py pagerank_fixed) over a
    200-node synthetic link graph (two formula out-edges per node
    plus hub edges into node 0): 3 unrolled rounds of integer
    micro-unit arithmetic, so the distributed sum is associative and
    the ranks are bit-identical across partitionings, cluster sizes,
    and the DuckDB oracle — no floating-point reduction-order drift
    by construction."""
    import tool_documentsconverter_spark.operators.web as W

    ids = spark.range(0, 200).select(F.col("id").alias("i"))
    e1 = ids.select(F.col("i").alias("src"),
                    ((F.col("i") * 7 + 3) % 200).alias("dst"))
    e2 = ids.select(F.col("i").alias("src"),
                    ((F.col("i") * 13 + 5) % 200).alias("dst"))
    e3 = ids.where(F.col("i") % 10 == 0).select(
        F.col("i").alias("src"), F.lit(0).cast("long").alias("dst"))
    edges = e1.unionByName(e2).unionByName(e3)
    return W.pagerank_fixed(edges, iters=3).orderBy("node")


def _pagerank_round(prev: str) -> str:
    return f"""
  SELECT n.node,
         CAST(150000 + (85 * coalesce(s.insum, 0)) // 100 AS BIGINT)
           AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(r.rank // o.odeg) AS BIGINT) AS insum
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst) s ON n.node = s.node
"""


_SQL_PAGERANK = """
WITH ids AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, 200) t(i)),
edges AS (
  SELECT i AS src, (i * 7 + 3) % 200 AS dst FROM ids
  UNION ALL SELECT i, (i * 13 + 5) % 200 FROM ids
  UNION ALL SELECT i, 0 FROM ids WHERE i % 10 = 0
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges
),
outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
r1 AS ({r1}),
r2 AS ({r2}),
r3 AS ({r3})
SELECT node, rank AS rank_micro FROM r3 ORDER BY node
""".format(r1=_pagerank_round("r0"), r2=_pagerank_round("r1"),
           r3=_pagerank_round("r2"))


def _q_pagerank_dangling(spark, sf_dir):
    """Fixed-point PageRank with DANGLING-MASS REDISTRIBUTION
    (operators/web.py pagerank_fixed(redistribute_dangling=True)) over
    a 200-node graph where every destination is odd and only even
    nodes have out-edges — half the graph is sinks, the worst case the
    classic drop-mass variant deflates.  Each round the sink mass is
    summed (one scalar aggregate) and (85% of it) // n micro-units are
    handed to every node; all arithmetic stays integer, so ranks are
    bit-identical across partitionings and the DuckDB oracle, which
    replays the per-round scalar as a subquery."""
    import tool_documentsconverter_spark.operators.web as W

    ids = spark.range(0, 200).select(F.col("id").alias("i")).where(
        F.col("i") % 2 == 0)
    e1 = ids.select(F.col("i").alias("src"),
                    ((F.col("i") * 7 + 3) % 200).alias("dst"))
    e2 = ids.select(F.col("i").alias("src"),
                    ((F.col("i") * 13 + 5) % 200).alias("dst"))
    edges = e1.unionByName(e2)
    return (W.pagerank_fixed(edges, iters=3, redistribute_dangling=True)
            .orderBy("node"))


def _pagerank_dangling_round(prev: str) -> str:
    return f"""
  SELECT n.node,
         CAST(150000
           + (SELECT (85 * CAST(coalesce(sum(r.rank), 0) AS BIGINT))
                 // (100 * (SELECT count(*) FROM nodes))
              FROM {prev} r
              WHERE r.node NOT IN (SELECT src FROM outdeg))
           + (85 * coalesce(s.insum, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           CAST(sum(r.rank // o.odeg) AS BIGINT) AS insum
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst) s ON n.node = s.node
"""


_SQL_PAGERANK_DANGLING = """
WITH ids AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, 200) t(i)
             WHERE i % 2 = 0),
edges AS (
  SELECT i AS src, (i * 7 + 3) % 200 AS dst FROM ids
  UNION ALL SELECT i, (i * 13 + 5) % 200 FROM ids
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges
),
outdeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
r1 AS ({r1}),
r2 AS ({r2}),
r3 AS ({r3})
SELECT node, rank AS rank_micro FROM r3 ORDER BY node
""".format(r1=_pagerank_dangling_round("r0"),
           r2=_pagerank_dangling_round("r1"),
           r3=_pagerank_dangling_round("r2"))


def _q_bpe_tokens(spark, sf_dir):
    """Tokenizer-aware token counting (operators/bpe.py): fixed-vocab
    greedy BPE expressed as a chain of literal string replaces over a
    marked representation — applying merges in rank order as global
    leftmost replaces IS classic fast-BPE encoding (a merge's inputs
    only come from earlier merges), and literal replace() has
    identical semantics in Spark and DuckDB, so the oracle replays the
    SAME DEFAULT_MERGES literal.  Zero shuffle; pure codegen."""
    from tool_documentsconverter_spark.operators.bpe import bpe_tokens

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_tokens(docs).orderBy("doc_id")


def _sql_bpe_segmented(expr: str) -> str:
    from tool_documentsconverter_spark.operators.bpe import DEFAULT_MERGES

    s = (
        r"regexp_replace(regexp_replace(lower(coalesce(" + expr
        + r", '')), '[^a-z0-9]+', '#', 'g'), '([a-z0-9])', ' \1 ', 'g')"
    )
    for x, y in DEFAULT_MERGES:
        s = f"replace({s}, ' {x}  {y} ', ' {x}{y} ')"
    return s


_SQL_BPE_TOKENS = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                     '[a-z0-9]+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all({_sql_bpe_segmented('text')},
                                     '[a-z0-9]+')) AS BIGINT) AS n_bpe_tokens
  FROM documents
)
SELECT doc_id, n_words, n_bpe_tokens,
       round(n_bpe_tokens / nullif(n_words, 0), 6) AS bpe_per_word
FROM t ORDER BY doc_id
"""


def _q_seq_packing_bpe(spark, sf_dir):
    """`seq_packing` with the budget measured in fixed-vocab BPE
    tokens instead of whitespace tokens (operators/textprep.py
    pack_sequences(tokenizer='bpe')) — the window algebra is
    unchanged, only the per-document cost column differs, and the
    oracle replays the merge chain on the same vocab literal."""
    from tool_documentsconverter_spark.operators.textprep import (
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    return (
        pack_sequences(docs, budget_tokens=256, part_col="source",
                       tokenizer="bpe")
        .orderBy("source", "doc_id")
    )


_SQL_SEQ_PACKING_BPE = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all({_sql_bpe_segmented('text')},
                                     '[a-z0-9]+')) AS BIGINT) AS n_tokens
  FROM documents
), w AS (
  SELECT source, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens AS BIGINT) AS tok_offset
  FROM t
)
SELECT source, doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / 256.0) AS BIGINT) AS bin
FROM w
ORDER BY source, doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver grades exactly the FIRST 50 entries.
    # The local harness (scripts/check_parity.py) always runs ALL
    # entries; the dict is ordered so every query rotates through the
    # driver's 50-entry window across rounds — rotation table in
    # COVERAGE.md.  Round 7 (VERDICT r6 item 3): the three new round-7
    # queries lead, the 17 queries first graded in round 6 stay, ALL
    # 26 queries parked in round 6 return to the window, and the four
    # weakest-history remaining queries fill the tail; the 29 parked
    # queries each have >= 2 driver-green rounds.
    return {
        # new round 7, never driver-graded:
        "pagerank_dangling": _q_pagerank_dangling,
        "bpe_tokens": _q_bpe_tokens,
        "seq_packing_bpe": _q_seq_packing_bpe,
        # first graded in round 6:
        "domain_stats": _q_domain_stats,
        "embedding_quantize": _q_embedding_quantize,
        "ann_ivf_quantized": _q_ivf_quantized,
        "dedup_compaction": _q_dedup_compaction,
        "dup_ngram_stats": _q_dup_ngram_stats,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "lm_perplexity": _q_lm_perplexity,
        "tfidf_terms": _q_tfidf_terms,
        "bm25_topk": _q_bm25_topk,
        "line_dedup": _q_line_dedup,
        "c4_filters": _q_c4_filters,
        "fuzzy_dedup_keep": _q_fuzzy_dedup_keep,
        "warc_extract": _q_warc_extract,
        "bloom_contamination": _q_bloom_contamination,
        "mixture_resample": _q_mixture_resample,
        "url_dedup": _q_url_dedup,
        "pagerank": _q_pagerank,
        # the 26 parked-in-r6 queries, back in the window:
        "repetition_signals": _q_repetition_signals,
        "cjk_textstats": _q_cjk_textstats,
        "lang_id": _q_langid,
        "corpus_curation": _q_corpus_curation,
        "text_chunks": _q_text_chunks,
        "stratified_sample": _q_stratified_sample,
        "seq_packing": _q_seq_packing,
        "ann_brute_topk": _q_ann_brute,
        "xlsx_sheet_csv": _q_xlsx_sheet_csv,
        "extract_dispatch": _q_extract_dispatch,
        "extract_binary_dispatch": _q_extract_binary,
        "ann_lsh_topk": _q_lsh_ann,
        "ann_ivf_topk": _q_ivf_ann,
        "skip_antijoin": _q_skip_antijoin,
        "exclude_predicates": _q_exclude_predicates,
        "verify_gate_counts": _q_verify_gate,
        "top1_per_source": _q_top1_per_source,
        "tpch_q1": _q_q1,
        "revenue_topk": _q_revenue_topk,
        "broadcast_dim_join": _q_broadcast_dim,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash_sig,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash": _q_simhash,
        "embedding_norms": _q_embedding_norms,
        "multimodal_meta": _q_multimodal_meta,
        # fewest-green-rounds fillers:
        "incremental_dedup": _q_incremental_dedup,
        "media_audio": _q_media_audio,
        "frame_sample": _q_frame_sample,
        "media_resize": _q_media_resize,
        # ====== driver window ends here (50 entries) ======
        # parked: every entry below is driver-green in >= 2 rounds
        # and stays covered by the local parity harness:
        "text_wrap_md": _q_text_wrap,
        "sanitize_stem": _q_sanitize,
        "format_sniff": _q_sniff,
        "heading_classifier": _q_heading_classifier,
        "message_tail": _q_message_tail,
        "union_branches": _q_union_branches,
        "rollup_agg": _q_rollup,
        "exact_percentiles": _q_percentiles,
        "events_hourly": _q_events_hourly,
        "transcript_flagship": _transcript_flagship,
        "media_features": _q_media_features,
        "media_headers": _q_media_headers,
        "md_pdf_roundtrip": _q_md_pdf_roundtrip,
        "docx_rich": _q_docx_rich,
        "pdf_layout": _q_pdf_layout,
        "sessionize": _q_sessionize,
        "lineage_agg": _q_lineage_agg,
        "events_json": _q_events_json,
        "events_rollup": _q_events_rollup,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "dup_clusters": _q_dup_clusters,
        "contamination_check": _q_contamination,
        "embedding_cosine_dups": _q_embedding_cosine_dups,
        "textstats": _q_textstats,
        "text_normalize_scrub": _q_normalize_scrub,
        "mojibake_repair": _q_mojibake_repair,
        "gopher_quality": _q_gopher_quality,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcript_flagship": _TRANSCRIPT_FLAGSHIP_SQL,
        "text_wrap_md": _SQL_TEXT_WRAP,
        "sanitize_stem": _SQL_SANITIZE,
        "format_sniff": _SQL_SNIFF,
        "heading_classifier": _SQL_HEADING,
        "message_tail": _SQL_MESSAGE_TAIL,
        "skip_antijoin": _SQL_SKIP_ANTIJOIN,
        "exclude_predicates": _SQL_EXCLUDE,
        "union_branches": _SQL_UNION,
        "sessionize": _SQL_SESSIONIZE,
        "verify_gate_counts": _SQL_VERIFY_GATE,
        "top1_per_source": _SQL_TOP1,
        "lineage_agg": _SQL_LINEAGE,
        "tpch_q1": _SQL_Q1,
        "rollup_agg": _SQL_ROLLUP,
        "exact_percentiles": _SQL_PERCENTILES,
        "revenue_topk": _SQL_REVENUE_TOPK,
        "broadcast_dim_join": _SQL_BROADCAST_DIM,
        "events_json": _SQL_EVENTS_JSON,
        "events_hourly": _SQL_EVENTS_HOURLY,
        "events_rollup": _SQL_EVENTS_ROLLUP,
        "asof_join": _SQL_ASOF,
        "range_join": _SQL_RANGE_JOIN,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "minhash_signatures": _SQL_MINHASH_SIG,
        "minhash_lsh_pairs": _SQL_MINHASH_PAIRS,
        "dup_clusters": _SQL_DUP_CLUSTERS,
        "incremental_dedup": _SQL_INCREMENTAL_DEDUP,
        "dedup_compaction": _SQL_DEDUP_COMPACTION,
        "domain_stats": _SQL_DOMAIN_STATS,
        "embedding_quantize": _SQL_EMBEDDING_QUANTIZE,
        "dup_ngram_stats": _SQL_DUP_NGRAM_STATS,
        "line_dedup": _SQL_LINE_DEDUP,
        "c4_filters": _SQL_C4_FILTERS,
        "fuzzy_dedup_keep": _SQL_FUZZY_KEEP,
        "warc_extract": _SQL_WARC_EXTRACT,
        "bloom_contamination": _SQL_BLOOM_CONTAMINATION,
        "mixture_resample": _SQL_MIXTURE_RESAMPLE,
        "url_dedup": _SQL_URL_DEDUP,
        "pagerank": _SQL_PAGERANK,
        "pagerank_dangling": _SQL_PAGERANK_DANGLING,
        "bpe_tokens": _SQL_BPE_TOKENS,
        "seq_packing_bpe": _SQL_SEQ_PACKING_BPE,
        "winnow_fingerprints": _SQL_WINNOW,
        "lm_perplexity": _SQL_LM_PERPLEXITY,
        "tfidf_terms": _SQL_TFIDF,
        "bm25_topk": _SQL_BM25,
        "ngram_jaccard": _SQL_NGRAM_JACCARD,
        "contamination_check": _SQL_CONTAMINATION,
        "simhash": _SQL_SIMHASH,
        "embedding_cosine_dups": _SQL_EMB_COSINE,
        "textstats": _SQL_TEXTSTATS,
        "text_normalize_scrub": _SQL_NORMALIZE_SCRUB,
        "mojibake_repair": _sql_mojibake(),
        "gopher_quality": _SQL_GOPHER,
        "repetition_signals": _SQL_REPETITION,
        "cjk_textstats": _SQL_CJK_TEXTSTATS,
        "lang_id": _SQL_LANGID,
        "corpus_curation": _SQL_CURATION,
        "text_chunks": _SQL_TEXT_CHUNKS,
        "stratified_sample": _SQL_STRATIFIED,
        "seq_packing": _SQL_SEQ_PACKING,
        "ann_brute_topk": _SQL_ANN_BRUTE,
        "ann_ivf_topk": _SQL_ANN_BRUTE,  # full probe == exact top-k
        "ann_ivf_quantized": _SQL_ANN_IVF_QUANTIZED,  # full probe ==
        # exact top-k over dequantized int8 codes
        "ann_lsh_topk": _SQL_ANN_LSH,
        "embedding_norms": _SQL_EMBEDDING_NORMS,
        "multimodal_meta": _SQL_MULTIMODAL,
        "media_features": _SQL_MEDIA_FEATURES,
        "media_headers": _SQL_MEDIA_HEADERS,
        "media_audio": _SQL_MEDIA_AUDIO,
        "media_resize": _SQL_MEDIA_RESIZE,
        "frame_sample": _SQL_FRAME_SAMPLE,
        "extract_dispatch": _SQL_EXTRACT_DISPATCH,
        "extract_binary_dispatch": _SQL_EXTRACT_BINARY,
        "md_pdf_roundtrip": _SQL_MD_PDF,
        "docx_rich": _SQL_DOCX_RICH,
        "pdf_layout": _SQL_PDF_LAYOUT,
        "xlsx_sheet_csv": _SQL_XLSX,
    }
