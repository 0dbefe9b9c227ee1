"""Web-graph operators: URL canonicalization/dedup, href extraction,
fixed-point PageRank."""

from pyspark.sql import functions as F

import tool_documentsconverter_spark.operators.web as W


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(W.canonical_url(F.col("url")).alias("c")).first().c


def test_canonical_url_rules(spark):
    assert (_canon(spark, "HTTP://WWW.Example.COM:80/Path/Sub/")
            == "http://example.com/Path/Sub")
    assert (_canon(spark, "https://site.org:443/a#frag")
            == "https://site.org/a")
    assert _canon(spark, "http://a.b/x?q=1#y") == "http://a.b/x?q=1"
    # path CASE is preserved; only scheme+host fold
    assert _canon(spark, "http://A.B/KeepCase") == "http://a.b/KeepCase"
    # non-default port survives
    assert _canon(spark, "http://a.b:8080/x") == "http://a.b:8080/x"
    # port stripping is SCHEME-AWARE: :443 on http (and :80 on https)
    # names a distinct resource and must survive canonicalization
    assert _canon(spark, "http://a.b:443/x") == "http://a.b:443/x"
    assert _canon(spark, "https://a.b:80/x") == "https://a.b:80/x"


def test_extract_links_quotes_and_anchor_skip(spark):
    html = ('<a href="http://x/1">a</a> <A HREF=\'http://x/2\'>b</a> '
            '<a href="#local">skip</a> <a href="http://x/3#s">c</a>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    hrefs = sorted(r.href for r in W.extract_links(df).collect())
    # HREF= (any case) matches — real crawl HTML mixes attribute case
    assert hrefs == ["http://x/1", "http://x/2", "http://x/3#s"]
    df2 = spark.createDataFrame(
        [(1, "<a Href='http://y/z'>q</a>")], "doc_id long, html string")
    assert [r.href for r in W.extract_links(df2).collect()] == ["http://y/z"]


def test_url_dedup_groups_equivalent_spellings(spark):
    df = spark.createDataFrame(
        [
            (3, "HTTP://WWW.Site.example:80/p"),
            (1, "http://site.example/p/"),
            (2, "http://site.example/p#frag"),
            (9, "https://other.example/q"),
            (7, "http://site.example:443/p"),  # NOT the default port
        ],
        "doc_id long, url string",
    )
    out = {r.canon_url: r for r in W.url_dedup(df, "doc_id", "url").collect()}
    assert out["http://site.example/p"].dup_count == 3
    assert out["http://site.example/p"].keeper_id == 1
    assert out["https://other.example/q"].dup_count == 1
    assert out["http://site.example:443/p"].dup_count == 1


def _python_pagerank(edges, iters=3, redistribute=False):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1_000_000 for v in nodes}
    for _ in range(iters):
        share = 0
        if redistribute:
            dangle = sum(rank[v] for v in nodes if v not in outdeg)
            share = (85 * dangle) // (100 * n)
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += rank[s] // outdeg[s]
        rank = {v: 150_000 + share + (85 * insum[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_replica_and_partitioning(spark):
    edges = ([(i, (i + 1) % 10) for i in range(10)]
             + [(i, 0) for i in range(1, 10)])
    expect = _python_pagerank(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micro
           for r in W.pagerank_fixed(df, iters=3).collect()}
    assert got == expect
    # node 0 (nine in-links) dominates
    assert got[0] == max(got.values())
    # fixed-point arithmetic: identical under a different partitioning
    again = {r.node: r.rank_micro
             for r in W.pagerank_fixed(df.repartition(7), iters=3).collect()}
    assert again == got


def test_pagerank_per_node_scale_is_size_independent(spark):
    # two disjoint copies of the same 3-cycle: per-node fixed-point
    # scale means each copy's ranks equal the single-copy ranks —
    # precision does not degrade as the graph grows
    cyc = [(0, 1), (1, 2), (2, 0)]
    one = _python_pagerank(cyc)
    both = cyc + [(s + 10, d + 10) for s, d in cyc]
    df = spark.createDataFrame(both, "src long, dst long")
    got = {r.node: r.rank_micro
           for r in W.pagerank_fixed(df, iters=3).collect()}
    for v, r in one.items():
        assert got[v] == r and got[v + 10] == r


def test_pagerank_dangling_and_isolated_dst(spark):
    # node 2 has no out-edges (dangling): its mass drops, it still
    # receives rank; per-node totals stay below n * 1e6
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: r.rank_micro
           for r in W.pagerank_fixed(df, iters=2).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == 150_000  # no in-links: base share only
    assert sum(got.values()) <= 3_000_000


def test_pagerank_redistribute_dangling(spark):
    edges = [(0, 1), (1, 2), (3, 2)]  # 2 is a sink holding mass
    expect = _python_pagerank(edges, iters=3, redistribute=True)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_micro
           for r in W.pagerank_fixed(
               df, iters=3, redistribute_dangling=True).collect()}
    assert got == expect
    # redistribution keeps strictly more total mass than the
    # drop-dangling default on the same graph
    dropped = {r.node: r.rank_micro
               for r in W.pagerank_fixed(df, iters=3).collect()}
    assert sum(got.values()) > sum(dropped.values())
    # still bit-identical under a different partitioning
    again = {r.node: r.rank_micro
             for r in W.pagerank_fixed(
                 df.repartition(5), iters=3,
                 redistribute_dangling=True).collect()}
    assert again == got


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert W.pagerank_fixed(df, iters=3).count() == 0
    assert W.pagerank_fixed(
        df, iters=3, redistribute_dangling=True).count() == 0
