"""WARC (ISO 28500) source: builder->parser identity, malformation
isolation, gzip member handling, and the WARC -> HTML -> Markdown
composition with the extraction kernel."""

from pyspark.sql import functions as F

from tool_documentsconverter_spark import kernels as K
from tool_documentsconverter_spark.sources.warc import (
    CRLF,
    build_warc_records,
    make_http_response,
    make_warc_bytes,
    parse_warc_records,
    read_warc,
)

PAGES = [
    ("http://a.example/1", 200, b"<html><body><h1>One</h1></body></html>"),
    ("http://a.example/2", 404, b"gone"),
    ("http://a.example/3", 200, b"<p>hello world</p>"),
]


def test_build_parse_roundtrip_plain_and_gzip():
    for compress in (False, True):
        recs = list(parse_warc_records(make_warc_bytes(PAGES,
                                                       compress=compress)))
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "response", "response"]
        assert [r["rec_idx"] for r in recs] == [0, 1, 2, 3]
        assert all(r["status"] == "ok" for r in recs)
        for (url, code, body), r in zip(PAGES, recs[1:]):
            assert r["url"] == url
            assert r["http_status"] == code
            assert r["mime"] == "text/html; charset=utf-8"
            assert r["body"] == body
        assert recs[0]["url"] is None and recs[0]["http_status"] is None
        assert recs[0]["body"] == b"software: spark-graft\r\n"


def test_junk_tail_isolates_as_one_failed_record():
    for compress in (False, True):
        data = make_warc_bytes(PAGES, compress=compress) + b"NOT A WARC"
        recs = list(parse_warc_records(data))
        assert len(recs) == 5
        assert [r["status"] for r in recs] == ["ok"] * 4 + ["failed"]
        assert recs[-1]["warc_type"] == "invalid"
        assert recs[-1]["rec_idx"] == 4


def test_truncated_block_and_missing_length_fail_cleanly():
    full = make_warc_bytes(PAGES)
    recs = list(parse_warc_records(full[: len(full) - 30]))
    assert recs[-1]["status"] == "failed"
    assert all(r["status"] == "ok" for r in recs[:-1])

    no_len = (b"WARC/1.0" + CRLF + b"WARC-Type: response" + CRLF + CRLF
              + b"xx")
    assert [r["status"] for r in parse_warc_records(no_len)] == ["failed"]


def test_malformed_http_envelope_fails_record_not_file():
    bad_http = build_warc_records([("http://x/1", 200, b"ok body")])
    # corrupt the status line in place (same length, unparseable code)
    bad = bad_http[1].replace(b"HTTP/1.1 200 OK", b"XTTP/1.1 two OK", 1)
    data = bad_http[0] + bad + build_warc_records(
        [("http://x/2", 200, b"fine")])[1]
    recs = list(parse_warc_records(data))
    assert [r["status"] for r in recs] == ["ok", "failed", "ok"]
    assert recs[1]["body"] == b""
    assert recs[2]["url"] == "http://x/2"


def test_http_response_builder_headers():
    resp = make_http_response(301, b"b", content_type="text/plain")
    assert resp.startswith(b"HTTP/1.1 301 Moved Permanently\r\n")
    assert b"Content-Length: 1\r\n" in resp


def test_read_warc_explodes_and_composes_with_html_kernel(spark):
    html = (b"<html><body><h1>Title Here</h1>"
            b"<p>some paragraph text</p></body></html>")
    rows = [
        (0, make_warc_bytes([("http://s/0", 200, html)])),
        (1, make_warc_bytes([("http://s/1", 200, html)], compress=True)
            + b"JUNK"),
    ]
    df = spark.createDataFrame(rows, "file_id long, payload binary")
    recs = read_warc(df).cache()
    got = {(r.file_id, r.rec_idx): r for r in recs.collect()}
    assert len(got) == 5  # 2x(warcinfo+response) + 1 invalid
    assert got[(1, 2)].status == "failed"
    # the html responses feed the existing HTML->Markdown kernel
    pages = (
        recs.where((F.col("warc_type") == "response")
                   & (F.col("http_status") == 200))
        .select("file_id", "url", F.col("body").cast("string").alias("html"))
        .collect()
    )
    recs.unpersist()
    assert len(pages) == 2
    for p in pages:
        md = K.convert_html("page", p.html)
        assert "# Title Here" in md and "some paragraph text" in md
