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


def test_extract_links_quotes_and_anchor_skip(spark):
    html = ('<a href="http://x/1">a</a> <A HREF=\'http://x/2\'>b</a> '
            '<a href="#local">skip</a> <a href="http://x/3#s">c</a>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    hrefs = sorted(r.href for r in W.extract_links(df).collect())
    assert hrefs == ["http://x/1", "http://x/3#s"]
    # the uppercase HREF attribute is NOT matched (case-sensitive regex,
    # documented); lowercase with single quotes is:
    df2 = spark.createDataFrame(
        [(1, "<a href='http://y/z'>q</a>")], "doc_id long, html string")
    assert [r.href for r in W.extract_links(df2).collect()] == ["http://y/z"]


def test_url_dedup_groups_equivalent_spellings(spark):
    df = spark.createDataFrame(
        [
            (3, "HTTP://WWW.Site.example:80/p"),
            (1, "http://site.example/p/"),
            (2, "http://site.example/p#frag"),
            (9, "https://other.example/q"),
        ],
        "doc_id long, url string",
    )
    out = {r.canon_url: r for r in W.url_dedup(df, "doc_id", "url").collect()}
    assert out["http://site.example/p"].dup_count == 3
    assert out["http://site.example/p"].keeper_id == 1
    assert out["https://other.example/q"].dup_count == 1


def _python_pagerank(edges, iters=3):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1_000_000 // n for v in nodes}
    for _ in range(iters):
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += rank[s] // outdeg[s]
        rank = {v: 150_000 // n + (85 * insum[v]) // 100 for v in nodes}
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


def test_pagerank_dangling_and_isolated_dst(spark):
    # node 2 has no out-edges (dangling): its mass drops, it still
    # receives rank; totals stay below the full 1e6 mass
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: r.rank_micro
           for r in W.pagerank_fixed(df, iters=2).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == 150_000 // 3  # no in-links: base share only
    assert sum(got.values()) <= 1_000_000
