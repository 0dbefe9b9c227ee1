"""Conditional parity with the REAL reference libraries.

The sandbox ships neither pdfminer.six nor openpyxl, so the engine's
stdlib fallbacks carry the semantics (kernels.extract_pdf_text,
kernels.parse_xlsx_bytes).  When the pinned libraries from
requirements-optional.txt ARE installed (CI / production), these tests
stop skipping and assert that kernel output and the real library agree
on the fixtures this repo generates — closing the "fallback drifted
from the reference's actual dependency" risk (SURVEY §7 hard-part (a)).
"""

import io

import pytest

from tool_documentsconverter_spark import kernels as K


def test_pdfminer_extracts_fixture_content():
    high_level = pytest.importorskip(
        "pdfminer.high_level", reason="pdfminer.six not installed (sandbox)"
    )
    from tool_documentsconverter_spark.sources.transcripts import make_pdf

    payload = make_pdf(7)
    real = high_level.extract_text(io.BytesIO(payload.encode("latin-1")))
    # with pdfminer installed, kernels.extract_pdf_text takes the
    # pdfminer path (the reference's, pdf_converter.py:25-27) — goldens
    # must be regenerated against it; here we pin that the fixture's
    # text content survives the real extractor
    for needle in ("Page one line 7", "second (escaped) line",
                   "Page two", "of turn 7"):
        assert needle in real
    via_kernel = K.extract_pdf_text(payload)
    for needle in ("Page one line 7", "Page two"):
        assert needle in via_kernel


def test_openpyxl_parity_with_stdlib_reader():
    openpyxl = pytest.importorskip(
        "openpyxl", reason="openpyxl not installed (sandbox)"
    )
    # build a real XLSX with openpyxl, then check the stdlib reader
    # decodes exactly what iter_rows(values_only=True) yields
    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = "data"
    ws.append(["a", 1, 2.5, None, True])
    ws.append([None, "x,y", "line\nbreak", 0, False])
    ws2 = wb.create_sheet("meta")
    ws2.append(["only"])
    buf = io.BytesIO()
    wb.save(buf)
    payload = buf.getvalue()

    expected = [
        (sn, [list(r) for r in wb[sn].iter_rows(values_only=True)])
        for sn in wb.sheetnames
    ]
    got = K.parse_xlsx_bytes(payload)
    assert got == expected
    for (_, r1), (_, r2) in zip(got, expected):
        assert K.sheet_to_csv_text(r1) == K.sheet_to_csv_text(r2)


def test_pillow_decode_stub_swap():
    PIL_Image = pytest.importorskip(
        "PIL.Image", reason="Pillow not installed (sandbox)"
    )
    from tool_documentsconverter_spark.operators.multimodal import (
        _decode_image_real,
    )

    img = PIL_Image.new("RGB", (32, 17))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, mode = _decode_image_real(buf.getvalue())
    assert (w, h, mode) == (32, 17, "RGB")
