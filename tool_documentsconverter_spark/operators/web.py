"""Web-graph operators for crawl curation: URL canonicalization +
exact-URL dedup, href link extraction, and a fixed-point PageRank.

Scale notes are per-function; everything is pure-column / join-based
DataFrame algebra — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_url(url) -> F.Column:
    """Canonical form of an http(s) URL, the pre-step of crawl-level
    exact-URL dedup: scheme and host lowercased, leading ``www.`` and
    explicit ``:80``/``:443`` ports stripped, the ``#fragment``
    dropped, trailing slashes removed.  Pure codegen (regexp chain);
    the DuckDB oracle replays the same patterns — every regex below
    is deliberately Java-regex/RE2 common-dialect."""
    u = F.coalesce(url, F.lit(""))
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    pathq = F.regexp_replace(rest, "^[^/?#]+", "")
    pathq = F.regexp_replace(pathq, "#.*$", "")
    pathq = F.regexp_replace(pathq, "/+$", "")
    return F.concat(scheme, F.lit("://"), host, pathq)


def url_dedup(df: DataFrame, id_col: str = "doc_id",
              url_col: str = "url") -> DataFrame:
    """Exact-URL dedup after canonicalization — the FIRST dedup pass
    of every crawl pipeline (cheaper than any content hash because it
    needs no payload).  One row per canonical URL: (canon_url,
    keeper_id = min id, dup_count).  Map-side combinable groupBy on
    the canonical string; no joins."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col))
                  .alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def extract_links(df: DataFrame, id_col: str = "doc_id",
                  html_col: str = "html") -> DataFrame:
    """(id, href) per anchor in the HTML — one codegen
    regexp_extract_all + explode, the same shape as domain_stats.
    Accepts single- or double-quoted href attributes."""
    pat = "href=[\"']([^\"'#][^\"']*)[\"']"
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.coalesce(F.col(html_col), F.lit("")),
                                 F.lit(pat), F.lit(1))
        ).alias("href"),
    )


def pagerank_fixed(edges: DataFrame, iters: int = 3,
                   damping_pct: int = 85) -> DataFrame:
    """PageRank over (src, dst) edges with a FIXED iteration count and
    FIXED-POINT integer arithmetic: ranks live in micro-units (total
    mass 1,000,000) and every step is integer floor division, so the
    distributed sum is associative and the result is bit-identical
    across partitionings, cluster sizes, AND the DuckDB oracle — the
    production answer to "floating-point reduction order makes my
    PageRank non-reproducible".  r_{t+1}(v) = (15% of mass)/N +
    (damping_pct * sum over in-edges of r_t(u) // outdeg(u)) // 100.
    Dangling-node mass is dropped (documented classic variant).

    Output: (node, rank_micro) for every node that appears as a src
    or dst.  The unrolled-loop shape (`iters` is small and fixed)
    keeps the plan static — no driver-side convergence checks; each
    round is one join + one map-side-combinable sum, shuffling only
    (node, long) pairs.  At deploy scale pre-partition `edges` by src
    once and every round's join co-locates for free."""
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one scalar — drives the literal base share
    base = 150_000 // n
    init = 1_000_000 // n
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, on="src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("outdeg")).alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("insum"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (F.lit(base)
                 + F.floor(F.lit(damping_pct)
                           * F.coalesce(F.col("insum"), F.lit(0))
                           / F.lit(100))).cast("long").alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").alias("rank_micro"))
