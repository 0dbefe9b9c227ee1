"""XLSX fan-out, multimodal plumbing, and streaming variant tests."""

import json
import os

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators.multimodal import (
    extract_media_features, sniff_media,
)
from tool_documentsconverter_spark.operators.xlsx_csv import workbooks_to_csv


def test_workbooks_explode_to_csv(spark):
    wb = json.dumps({"sheets": [
        {"name": "data", "rows": [[1, "a"], [None, 2.5]]},
        {"name": "b/ad", "rows": [["x,y"]]},
    ]})
    wb_single = json.dumps({"sheets": [{"name": "only", "rows": [["z"]]}]})
    df = spark.createDataFrame(
        [("book1", wb), ("book2", wb_single), ("broken", "{not json")],
        "stem string, payload string",
    )
    rows = {(r.stem, r.csv_name): r for r in workbooks_to_csv(df).collect()}
    # fan-out: multi-sheet -> stem__sheet.csv (xlsx_to_csv/main.py:139-147)
    assert rows[("book1", "book1__data.csv")].csv_text == "1,a\r\n,2.5\r\n"
    assert rows[("book1", "book1__b_ad.csv")].csv_text == '"x,y"\r\n'
    assert rows[("book2", "book2.csv")].csv_text == "z\r\n"
    # failure isolation: bad payload -> failed row, job completes
    assert rows[("broken", None)].status == "failed"
    assert len(rows) == 4


def test_media_features_stub(spark):
    jpeg = b"\xff\xd8\xff" + b"fakejpegbody"
    png = b"\x89PNG\r\n" + b"fakepngbody"
    junk = b"zzzz"
    df = spark.createDataFrame(
        [(1, jpeg), (2, png), (3, junk)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in extract_media_features(df, use_stub=True).collect()}
    assert rows[1].kind == "jpeg" and rows[2].kind == "png"
    assert rows[3].kind == "unknown"
    assert rows[1].payload_bytes == len(jpeg)
    # stub decode is deterministic
    assert rows[1].width == rows[1].width and rows[1].mode == "STUB"
    assert all(r.status == "ok" for r in rows.values())


def test_fit_within_pure():
    from tool_documentsconverter_spark.operators.multimodal import fit_within

    assert fit_within(640, 480, 100) == (100, 75)
    assert fit_within(480, 640, 100) == (75, 100)
    assert fit_within(80, 60, 100) == (80, 60)      # never upscale
    assert fit_within(10000, 3, 100) == (100, 1)    # floor never hits 0


def test_resize_media_stub(spark):
    import hashlib

    from tool_documentsconverter_spark.operators.multimodal import (
        _decode_stub, fit_within, resize_media,
    )

    jpeg = b"\xff\xd8\xff" + b"fakejpegbody"
    df = spark.createDataFrame(
        [(1, jpeg), (2, None)], "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in resize_media(df, max_side=100, use_stub=True).collect()}
    w, h, _ = _decode_stub(jpeg)
    tw, th = fit_within(w, h, 100)
    assert (rows[1].width, rows[1].height) == (w, h)
    assert (rows[1].out_width, rows[1].out_height) == (tw, th)
    assert rows[1].status == "ok"
    # the binary return path carries the content-addressed fake pixels
    assert bytes(rows[1].resized) == hashlib.md5(
        jpeg + f"|resize:{tw}x{th}".encode()
    ).digest()
    assert rows[2].status == "failed" and rows[2].resized is None


def test_sample_frames_fanout(spark):
    import hashlib

    from tool_documentsconverter_spark.operators.multimodal import sample_frames

    vid = b"RIFF" + b"fakevideobody"
    df = spark.createDataFrame(
        [(1, vid), (2, None)], "media_id long, payload binary"
    )
    out = sample_frames(df, n_frames=4).collect()
    ok = sorted((r.frame_idx for r in out if r.media_id == 1))
    assert ok == [0, 1, 2, 3]  # 1 row in -> n_frames rows out
    hx = hashlib.md5(vid).hexdigest()
    duration = 1000 + int(hx[4:6], 16) * 250
    by_idx = {r.frame_idx: r for r in out if r.media_id == 1}
    for k in range(4):
        assert by_idx[k].offset_ms == k * duration // 4
        assert by_idx[k].frame_md5 == hashlib.md5(
            f"{hx}:{k}".encode()
        ).hexdigest()
    failed = [r for r in out if r.media_id == 2]
    assert len(failed) == 1 and failed[0].status == "failed"


def test_sniff_media_pure():
    assert sniff_media(b"\xff\xd8\xffxx") == "jpeg"
    assert sniff_media(b"RIFFxxxx") == "riff"
    assert sniff_media(None) == "unknown"


def test_stream_extract_available_now(spark, tmp_path):
    from tool_documentsconverter_spark.sources.transcripts import write_transcripts
    from tool_documentsconverter_spark.streaming.stream_extract import (
        run_stream_extract,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_transcripts(spark, inp, 120)

    q = run_stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 120
    assert {r.status for r in got.select("status").distinct().collect()} \
        <= {"ok", "failed"}

    # restart with same checkpoint: no new data -> no duplicates
    q2 = run_stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 120


def test_parse_image_header_reads_back_written_dims():
    from tool_documentsconverter_spark.operators.multimodal import (
        parse_image_header,
    )
    from tool_documentsconverter_spark.sources.transcripts import (
        make_gif_bytes, make_jpeg_bytes, make_png_bytes,
    )

    assert parse_image_header(make_png_bytes(123, 45)) == (123, 45, "RGB")
    assert parse_image_header(make_jpeg_bytes(800, 600)) == (800, 600, "RGB")
    assert parse_image_header(make_gif_bytes(64, 2)) == (64, 2, "P")
    # 16-bit-boundary dims survive the endianness handling
    assert parse_image_header(make_png_bytes(65535, 1))[:2] == (65535, 1)
    assert parse_image_header(make_gif_bytes(65535, 1))[:2] == (65535, 1)


def test_parse_image_header_rejects_truncated_and_junk():
    import pytest

    from tool_documentsconverter_spark.operators.multimodal import (
        _decode_stdlib, _decode_stub, parse_image_header,
    )

    for bad in (b"JUNK", b"\x89PNG\r\n\x1a\nXXXX",
                b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9",  # no SOF
                b"GIF89a\x00\x00\x00\x00\x70\x00\x00;"):      # zero dims
        with pytest.raises(ValueError):
            parse_image_header(bad)
        # the production no-PIL decoder falls back to the hash stub
        assert _decode_stdlib(bad) == _decode_stub(bad)


def test_media_features_true_dims_without_pil(spark):
    # production path (use_stub unset, Pillow absent in this sandbox):
    # real containers report REAL dims, junk reports stub dims
    from tool_documentsconverter_spark.operators.multimodal import (
        _decode_stub, extract_media_features,
    )
    from tool_documentsconverter_spark.sources.transcripts import (
        make_jpeg_bytes, make_png_bytes,
    )

    junk = b"not an image"
    df = spark.createDataFrame(
        [(1, make_png_bytes(320, 200)), (2, make_jpeg_bytes(77, 33)),
         (3, junk)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_media_features(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].mode) == (320, 200, "RGB")
    assert (rows[2].width, rows[2].height, rows[2].mode) == (77, 33, "RGB")
    w, h, m = _decode_stub(junk)
    assert (rows[3].width, rows[3].height, rows[3].mode) == (w, h, m)


def test_resize_media_uses_true_dims_without_pil(spark):
    from tool_documentsconverter_spark.operators.multimodal import (
        fit_within, resize_media,
    )
    from tool_documentsconverter_spark.sources.transcripts import (
        make_png_bytes,
    )

    df = spark.createDataFrame(
        [(1, make_png_bytes(400, 100))], "media_id long, payload binary")
    r = resize_media(df, max_side=100).collect()[0]
    assert (r.width, r.height) == (400, 100)
    assert (r.out_width, r.out_height) == fit_within(400, 100, 100) == (100, 25)
