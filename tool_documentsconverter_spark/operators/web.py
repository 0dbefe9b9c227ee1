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
    exact-URL dedup: scheme and host lowercased, leading ``www.``
    stripped, the scheme's OWN default port stripped (``:80`` only for
    http, ``:443`` only for https — ``http://host:443`` is a distinct
    resource and stays distinct), the ``#fragment`` dropped, trailing
    slashes removed.  Pure codegen (regexp chain + CASE); the DuckDB
    oracle replays the same patterns — every regex below is
    deliberately Java-regex/RE2 common-dialect."""
    u = F.coalesce(url, F.lit(""))
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
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
    Accepts single- or double-quoted href attributes, any case
    (``HREF=``/``Href=`` are common in real crawl HTML — the ``(?i)``
    prefix is accepted by both Java regex and RE2, so the oracle can
    replay it)."""
    pat = "(?i)href=[\"']([^\"'#][^\"']*)[\"']"
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.coalesce(F.col(html_col), F.lit("")),
                                 F.lit(pat), F.lit(1))
        ).alias("href"),
    )


def pagerank_fixed(edges: DataFrame, iters: int = 3,
                   damping_pct: int = 85,
                   redistribute_dangling: bool = False) -> DataFrame:
    """PageRank over (src, dst) edges with a FIXED iteration count and
    FIXED-POINT integer arithmetic: ranks live in PER-NODE micro-units
    (every node starts at 1,000,000; total mass is n x 1e6) and every
    step is integer floor division, so the distributed sum is
    associative and the result is bit-identical across partitionings,
    cluster sizes, AND the DuckDB oracle — the production answer to
    "floating-point reduction order makes my PageRank
    non-reproducible".  The per-node scale means precision is
    INDEPENDENT of graph size: at 10^9 nodes each rank still carries
    six significant digits (a global 1e6 budget would floor every
    share to 0 beyond ~1M nodes).
    r_{t+1}(v) = 150,000 + (damping_pct * sum over in-edges of
    r_t(u) // outdeg(u)) // 100  [+ dangling share, see below].

    ``redistribute_dangling=True`` adds the classic correction for
    sink pages (very common on real web graphs): each round the total
    rank sitting on zero-outdegree nodes is summed (ONE scalar
    aggregate per round — `iters` is small and fixed) and
    (damping_pct * dangling_sum) // (100 * n) micro-units are handed
    to every node, keeping total mass ~constant instead of shrinking
    each round.  The integer share is computed driver-side in exact
    Python arithmetic, then folded in as a literal, so the fixed-point
    determinism guarantee is unchanged.  Default False = the
    drop-dangling-mass variant, pinned because the round-6 oracle
    replays it.

    Output: (node, rank_micro) for every node that appears as a src
    or dst; empty edges => empty result (no driver-side division by
    zero).  The unrolled-loop shape (`iters` is small and fixed) keeps
    the plan static; each round is one join + one map-side-combinable
    sum, shuffling only (node, long) pairs.  At deploy scale
    pre-partition `edges` by src once and every round's join
    co-locates for free."""
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if redistribute_dangling:
        # Round-8: the per-round dangling sum rides as an Observation
        # on the SAME action that checkpoints the round's ranks (the
        # cluster_duplicates convergence pattern) — each round costs
        # ONE job instead of two (the old shape ran a separate
        # dangling-join + first() scalar job per round; per-round
        # driver latency is the serial term that eats N->4N scaling).
        # `base` carries a _has_out flag so the dangling restriction
        # is a conditional sum instead of a join.
        from pyspark.sql import Observation

        outdeg = outdeg.localCheckpoint(eager=True)
        n = nodes.count()
        if n == 0:
            return nodes.select("node",
                                F.lit(0).cast("long").alias("rank_micro"))
        base = (
            nodes.join(
                outdeg.select(F.col("src").alias("node"),
                              F.lit(True).alias("_has_out")),
                on="node", how="left")
            .select("node",
                    F.coalesce("_has_out", F.lit(False)).alias("_has_out"))
            .localCheckpoint(eager=True)
        )
        dang_metric = F.sum(
            F.when(~F.col("_has_out"), F.col("rank")).otherwise(F.lit(0))
        ).alias("dang")
        obs = Observation("pr_dangling_init")
        ranks = (
            base.select("node",
                        F.lit(1_000_000).cast("long").alias("rank"),
                        "_has_out")
            .observe(obs, dang_metric)
            .localCheckpoint(eager=True)
        )
        dang_sum = int(obs.get["dang"] or 0)
    else:
        ranks = nodes.select("node",
                             F.lit(1_000_000).cast("long").alias("rank"))
    for i in range(iters):
        share_lit = 0
        if redistribute_dangling:
            share_lit = (damping_pct * dang_sum) // (100 * n)
        contrib = (
            edges.join(ranks.select("node", "rank"),
                       edges.src == F.col("node"))
            .join(outdeg, on="src")
            .select(
                F.col("dst").alias("node"),
                # `div` = exact integer division on longs — F.floor(a/b)
                # goes through double and drifts past 2^53, which a hub
                # node's rank exceeds on 1e9-node graphs
                F.expr("rank div outdeg").alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("insum"))
        )
        rank_expr = F.expr(
            f"cast({150_000 + share_lit} + ({damping_pct} * "
            "coalesce(insum, cast(0 as long))) div 100 as long)"
        ).alias("rank")
        if redistribute_dangling:
            obs = Observation(f"pr_dangling_{i}")
            ranks = (
                base.join(contrib, on="node", how="left")
                .select("node", rank_expr, "_has_out")
                .observe(obs, dang_metric)
                .localCheckpoint(eager=True)
            )
            dang_sum = int(obs.get["dang"] or 0)
        else:
            ranks = nodes.join(contrib, on="node", how="left").select(
                "node", rank_expr)
    return ranks.select("node", F.col("rank").alias("rank_micro"))
