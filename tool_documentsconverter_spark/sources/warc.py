"""CommonCrawl-style WARC ingestion (ISO 28500) — the source format a
web-scale extraction pipeline actually reads.

Pure-stdlib, fully real (no stub): record headers, HTTP response
envelopes, and per-record gzip members are parsed from bytes exactly
as crawlers write them.  The reference converter has no web-archive
source at all (its scanner walks a filesystem — reference
`find_documents`); this module gives the Spark engine the
`spark.read -> explode records -> convert_html` front end that the
100 TB training-data story needs.

Layout of a WARC record::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: http://...\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: N\r\n
    \r\n
    <N-byte block>\r\n
    \r\n

A ``.warc.gz`` file is a CONCATENATION of independently gzipped
records (one gzip member each) so a reader can split work at member
boundaries; `parse_warc_records` accepts both forms transparently.

Scale shape: one WARC file maps to one input row (binary column) and
explodes into its records inside a single Arrow stage — exactly the
`mapInArrow` fan-out the image/audio operators use.  On a real
cluster the file list arrives via `spark.read.format("binaryFile")`
(or a manifest table) and the per-file parse is embarrassingly
parallel; record-level malformation isolates as a `failed` row, never
a task failure.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from typing import Any

CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# --------------------------------------------------------------- builders
def make_http_response(status: int, body: bytes,
                       content_type: str = "text/html; charset=utf-8"
                       ) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently",
              500: "Internal Server Error"}.get(status, "Unknown")
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body


def _record(warc_type: str, block: bytes, content_type: str,
            extra: list[tuple[str, str]] = ()) -> bytes:
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode("ascii"),
             b"WARC-Date: 2026-01-01T00:00:00Z",
             b"WARC-Record-ID: <urn:uuid:0>"]
    for k, v in extra:
        lines.append(f"{k}: {v}".encode("ascii"))
    lines.append(b"Content-Type: " + content_type.encode("ascii"))
    lines.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def build_warc_records(pages: list[tuple[str, int, bytes]],
                       software: str = "spark-graft") -> list[bytes]:
    """One warcinfo record followed by one response record per
    (url, http_status, html_body) page — each element an independent
    record byte string so callers can gzip them member-wise."""
    recs = [_record("warcinfo",
                    f"software: {software}\r\n".encode("ascii"),
                    "application/warc-fields")]
    for url, status, body in pages:
        recs.append(_record(
            "response", make_http_response(status, body),
            "application/http; msgtype=response",
            extra=[("WARC-Target-URI", url)],
        ))
    return recs


def make_warc_bytes(pages, software: str = "spark-graft",
                    compress: bool = False) -> bytes:
    recs = build_warc_records(pages, software)
    if compress:  # one gzip member per record, the .warc.gz convention
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


# ---------------------------------------------------------------- parser
def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members; a non-gzip tail (junk, a
    truncated member) is appended RAW so the record parser can flag it
    as an invalid record instead of losing the whole file."""
    out = []
    while data:
        if data[:2] != _GZIP_MAGIC:
            out.append(data)
            break
        obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(obj.decompress(data))
            out.append(obj.flush())
        except zlib.error:
            out.append(data)
            break
        data = obj.unused_data
    return b"".join(out)


def _invalid(idx: int) -> dict[str, Any]:
    return {"rec_idx": idx, "warc_type": "invalid", "url": None,
            "http_status": None, "mime": None, "body": b"",
            "status": "failed"}


def parse_warc_records(data: bytes) -> Iterator[dict[str, Any]]:
    """Yield one dict per record: rec_idx, warc_type, url, http_status,
    mime, body (block; for responses the HTTP body), status.  A
    malformed region yields ONE status='failed' record and stops —
    without gzip member boundaries there is no safe resync point, and
    emitting half-parsed garbage as 'ok' is worse than truncating."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos, idx, n = 0, 0, len(data)
    while pos < n:
        while data.startswith(CRLF, pos):  # inter-record separators
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if not data.startswith(b"WARC/", pos) or head_end < 0:
            yield _invalid(idx)
            return
        hdrs: dict[str, str] = {}
        head = data[pos:head_end].decode("latin-1")
        for line in head.split("\r\n")[1:]:
            key, _, val = line.partition(":")
            hdrs[key.strip().lower()] = val.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            yield _invalid(idx)
            return
        block = data[head_end + 4:head_end + 4 + clen]
        if len(block) < clen:  # truncated file
            yield _invalid(idx)
            return
        wtype = hdrs.get("warc-type", "unknown")
        rec: dict[str, Any] = {
            "rec_idx": idx, "warc_type": wtype,
            "url": hdrs.get("warc-target-uri"),
            "http_status": None, "mime": None,
            "body": block, "status": "ok",
        }
        if (wtype in ("response", "revisit")
                and hdrs.get("content-type", "")
                .startswith("application/http")):
            http_end = block.find(b"\r\n\r\n")
            try:
                if http_end < 0:
                    raise ValueError("no HTTP head terminator")
                http_head = block[:http_end].decode("latin-1")
                http_lines = http_head.split("\r\n")
                rec["http_status"] = int(http_lines[0].split()[1])
                for line in http_lines[1:]:
                    key, _, val = line.partition(":")
                    if key.strip().lower() == "content-type":
                        rec["mime"] = val.strip()
                rec["body"] = block[http_end + 4:]
            except (ValueError, IndexError):
                rec["body"] = b""
                rec["status"] = "failed"
        yield rec
        idx += 1
        pos = head_end + 4 + clen


# ---------------------------------------------------------- Spark reader
WARC_RECORD_SCHEMA = ("file_id long, rec_idx int, warc_type string, "
                      "url string, http_status int, mime string, "
                      "body binary, status string")


def _warc_batches():
    import pyarrow as pa

    def gen(batches):
        for batch in batches:
            if batch.num_rows == 0:  # empty batch would infer null types
                continue
            names = batch.schema.names
            ids = batch.column(names.index("file_id")).to_pylist()
            payloads = batch.column(names.index("payload")).to_pylist()
            cols: dict[str, list] = {k: [] for k in (
                "file_id", "rec_idx", "warc_type", "url", "http_status",
                "mime", "body", "status")}
            for fid, payload in zip(ids, payloads):
                for rec in parse_warc_records(payload or b""):
                    cols["file_id"].append(fid)
                    cols["rec_idx"].append(rec["rec_idx"])
                    cols["warc_type"].append(rec["warc_type"])
                    cols["url"].append(rec["url"])
                    cols["http_status"].append(rec["http_status"])
                    cols["mime"].append(rec["mime"])
                    cols["body"].append(rec["body"])
                    cols["status"].append(rec["status"])
            if not cols["file_id"]:
                continue
            yield pa.RecordBatch.from_pydict({
                "file_id": pa.array(cols["file_id"], type=pa.int64()),
                "rec_idx": pa.array(cols["rec_idx"], type=pa.int32()),
                "warc_type": pa.array(cols["warc_type"], type=pa.string()),
                "url": pa.array(cols["url"], type=pa.string()),
                "http_status": pa.array(cols["http_status"],
                                        type=pa.int32()),
                "mime": pa.array(cols["mime"], type=pa.string()),
                "body": pa.array(cols["body"], type=pa.binary()),
                "status": pa.array(cols["status"], type=pa.string()),
            })

    return gen


def read_warc(df, id_col: str = "file_id", payload_col: str = "payload"):
    """(file_id, payload:binary WARC file) -> one row per record via a
    single Arrow stage.  Files are the parallelism unit (a real corpus
    scan has millions of them); a malformed region inside one file
    isolates as a failed row and never kills the task."""
    from pyspark.sql import functions as F

    from ..plans.fanout import fan_out

    src = fan_out(df.select(F.col(id_col).alias("file_id"),
                            F.col(payload_col).alias("payload")))
    return src.mapInArrow(_warc_batches(), WARC_RECORD_SCHEMA)
