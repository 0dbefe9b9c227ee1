"""Property-based kernel laws (SURVEY.md §5 item 3) — pure Python,
no Spark session needed."""

import csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st

from tool_documentsconverter_spark import kernels as K


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(
    st.one_of(st.none(), st.integers(), st.floats(allow_nan=False),
              st.booleans(), st.text(max_size=40)),
    max_size=6), max_size=6))
def test_csv_roundtrip_stringify_law(rows):
    """F7/E9 law: parsing our CSV text back yields exactly
    `'' if v is None else str(v)` per cell (xlsx_to_csv/main.py:94-104),
    with CRLF row endings."""
    text = K.sheet_to_csv_text(rows)
    parsed = list(csv.reader(io.StringIO(text)))
    expected = [[K.stringify_cell(v) for v in row] for row in rows]
    # csv.reader drops nothing: row counts and values must round-trip
    assert parsed == [r for r in expected]
    if rows:
        assert text.endswith("\r\n")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_heading_classifier_law(style):
    """E4 law (docx_converter.py:79-85): level defined iff style starts
    with 'Heading'; 2/3 only for the exact names; everything else 1."""
    lvl = K.heading_level(style)
    if not style.startswith("Heading"):
        assert lvl is None
    elif style == "Heading 2":
        assert lvl == 2
    elif style == "Heading 3":
        assert lvl == 3
    else:
        assert lvl == 1


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_sanitize_law(style):
    """F8 law: result never contains a blacklist char, never has
    leading/trailing whitespace, and is never empty."""
    out = K.sanitize_stem(style)
    assert out
    assert out == out.strip()
    for ch in '/\\:*?"<>|':
        assert ch not in out


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200),
       st.sampled_from(["", "text", "pdf", "docx", "html", "doc"]))
def test_extract_never_raises(payload, hint):
    """Failure-isolation law (doc_to_md/main.py:451-456): extract_turn
    NEVER raises, always returns a valid status triple."""
    md, status, message = K.extract_turn("c", 0, payload, hint)
    assert status in (K.OK, K.FAILED)
    assert isinstance(md, str) and isinstance(message, str)
    assert len(message) <= K.MESSAGE_TAIL


@settings(max_examples=100, deadline=1000)
@given(st.binary(max_size=4096))
def test_ole_doc_fuzz_fails_fast(garbage):
    """Binary-kernel robustness law: OLE magic + arbitrary bytes must
    either parse to a str or raise CLEANLY and promptly (the
    per-example deadline flags pathologically slow — though still
    terminating — parses; a true infinite loop is out of hypothesis's
    reach and is guarded in ole.py itself by the FAT cycle check).
    The type assertion sits OUTSIDE the try so a wrong-type return
    cannot be swallowed as a 'clean failure'."""
    from tool_documentsconverter_spark.ole import extract_doc_text

    payload = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + garbage
    try:
        out = extract_doc_text(payload)
    except Exception:
        return  # clean failure is the contract
    assert isinstance(out, str)


@settings(max_examples=100, deadline=1000)
@given(st.binary(max_size=4096))
def test_xlsx_zip_fuzz_fails_fast(garbage):
    """Same law for the ZIP+XML workbook reader."""
    from tool_documentsconverter_spark.kernels import parse_xlsx_bytes

    payload = b"PK\x03\x04" + garbage
    try:
        sheets = parse_xlsx_bytes(payload)
    except Exception:
        return
    assert isinstance(sheets, list)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200))
def test_text_wrap_shape_law(text):
    """E8 law: the wrap always yields the exact frame, and the frame
    always passes the D2 verify gate."""
    md = K.wrap_text_md("stem", text)
    assert md.startswith("# stem\n\n```text\n")
    assert md.endswith("\n```\n")
    assert K.verify_markdown(md)
