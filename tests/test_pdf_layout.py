"""Layout-aware PDF reading order (marker-class intent, reference
doc_to_md/main.py:124-143): the fallback extractor tracks the text
matrix through Td/TD/Tm/TL/T*/BT and emits text-showing ops sorted
top-to-bottom (y desc), left-to-right (x asc) — stream order is only
the stable tie-break."""

from tool_documentsconverter_spark import kernels as K
from tool_documentsconverter_spark.sources.transcripts import (
    make_pdf,
    make_two_column_pdf,
)


def test_two_column_stream_order_differs_from_reading_order():
    # the fixture writes the right column FIRST in the stream
    pdf = make_two_column_pdf(9)
    assert pdf.index("Right top") < pdf.index("Left top")
    got = K.extract_pdf_text(pdf)
    assert got == "Left top 9\nRight top 9\nLeft bottom\nRight bottom"


def test_tm_positions_and_tl_leading():
    s = (
        "BT 1 0 0 1 72 700 Tm (second row) Tj "
        "1 0 0 1 72 714 Tm (first row) Tj ET"
    )
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "first row\nsecond row"


def test_td_accumulates_and_tstar_descends():
    s = "BT 72 720 Td 14 TL (a) Tj T* (b) Tj T* (c) Tj ET"
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "a\nb\nc"


def test_positionless_ops_keep_stream_order():
    # degenerate PDFs with no positioning at all: stable tie-break
    s = "BT (one) Tj (two) Tj ET"
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "one\ntwo"


def test_existing_fixture_bytes_unchanged():
    # the P7 fixture (strictly structured positioning) must extract to
    # the same bytes as before the layout rewrite
    got = K.extract_pdf_text(make_pdf(3))
    assert got == (
        "Page one line 3\nsecond (escaped) line\n\nPage two of turn 3"
    )


def test_md_pdf_sink_still_roundtrips():
    md = "# T\n\nalpha\nbeta"
    assert K.extract_pdf_text(
        K.markdown_to_pdf_bytes(md).decode("latin-1")) == md


def test_malformed_positioning_tokens_do_not_fail_document():
    # ADVICE r3: "1.2.3" / "." / "-" matched the old loose number class
    # and float() raised, flipping the whole document to failed.  With
    # the valid-float grammar the malformed op never forms; text ops
    # still extract.
    for bad in ("1.2.3 4 Td", ". 4 Td", "- 4 Td", "1..5 2 TD", "..7 TL"):
        s = f"BT {bad} (hello) Tj ET"
        pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
        assert "hello" in K.extract_pdf_text(pdf), bad


def test_valid_floats_still_position():
    # the tightened grammar must keep matching every legal float shape
    s = "BT -.5 700.25 Td (low) Tj .5 14. Td (high) Tj ET"
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "high\nlow"
