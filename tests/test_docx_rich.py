"""Pandoc-class DOCX richness (E3): numbering.xml-resolved ordered and
nested bullet lists, rels-resolved hyperlinks, anchor links, and
bold/italic run emphasis — the reference's PRIMARY DOCX surface
(doc_to_md/docx_converter.py:37-63 via pandoc), reproduced pure-stdlib
with a documented deterministic grammar (kernels.py at
_ORDERED_NUMFMTS).  Goldens pinned byte-exactly."""

from tool_documentsconverter_spark import kernels as K
from tool_documentsconverter_spark.sources.transcripts import (
    make_rich_docx_bytes,
    rich_docx_expected_md,
)

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _doc(body: str) -> str:
    return f'<?xml version="1.0"?><w:document {W}><w:body>{body}</w:body></w:document>'


def _li(num_id: int, ilvl: int, text: str) -> str:
    return (
        f'<w:p><w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
        f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>'
        f"<w:r><w:t>{text}</w:t></w:r></w:p>"
    )


def test_rich_docx_golden_byte_exact():
    got = K.convert_docx_bytes("rd7", make_rich_docx_bytes(7))
    assert got == rich_docx_expected_md("rd7", 7)


def test_ordered_counter_resets_when_shallower_level_advances():
    numbering = {"1": {0: "decimal", 1: "decimal"}}
    body = (
        _li(1, 0, "top one") + _li(1, 1, "sub a") + _li(1, 1, "sub b")
        + _li(1, 0, "top two") + _li(1, 1, "sub restarts")
    )
    md = K.convert_docx_xml("s", _doc(body), numbering=numbering)
    assert md == (
        "# s\n\n"
        "1. top one\n"
        "    1. sub a\n"
        "    2. sub b\n"
        "2. top two\n"
        "    1. sub restarts\n"  # NOT '3.': parent advanced in between
        "\n"
    )


def test_unmapped_numid_defaults_to_bullet():
    md = K.convert_docx_xml("s", _doc(_li(42, 0, "item")))
    assert "- item\n" in md


def test_paragraph_closes_list_block():
    numbering = {"1": {0: "bullet"}}
    body = _li(1, 0, "one") + "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
    md = K.convert_docx_xml("s", _doc(body), numbering=numbering)
    assert md == "# s\n\n- one\n\nafter\n\n"


def test_blank_list_item_dropped_without_splitting_list():
    body = _li(1, 0, "one") + _li(1, 0, "   ") + _li(1, 0, "two")
    md = K.convert_docx_xml("s", _doc(body))
    assert md == "# s\n\n- one\n- two\n\n"


def test_emphasis_toggle_val_false_is_off():
    body = (
        '<w:p><w:r><w:rPr><w:b w:val="false"/></w:rPr><w:t>notbold</w:t>'
        '</w:r><w:r><w:rPr><w:b w:val="0"/></w:rPr><w:t> also</w:t></w:r>'
        '<w:r><w:rPr><w:b w:val="off"/></w:rPr><w:t> off</w:t></w:r>'
        "</w:p>"
    )
    md = K.convert_docx_xml("s", _doc(body))
    assert md == "# s\n\nnotbold also off\n\n"


def test_adjacent_same_format_runs_merge():
    body = (
        "<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>bo</w:t></w:r>"
        "<w:r><w:rPr><w:b/></w:rPr><w:t>ld</w:t></w:r></w:p>"
    )
    md = K.convert_docx_xml("s", _doc(body))
    assert "**bold**" in md and "****" not in md


def test_edge_whitespace_moves_outside_markers():
    body = "<w:p><w:r><w:rPr><w:i/></w:rPr><w:t> pad </w:t></w:r></w:p>"
    has_body, blocks, _, _ = K._et_docx_parse(_doc(body))
    assert blocks[0][2] == " *pad* "  # inline form before paragraph strip


def test_unresolvable_hyperlink_degrades_to_text():
    body = (
        '<w:p><w:hyperlink r:id="rId1" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><w:r><w:t>bare</w:t></w:r></w:hyperlink></w:p>'
    )
    md = K.convert_docx_xml("s", _doc(body))  # no rels map passed
    assert md == "# s\n\nbare\n\n"


def test_bare_t_outside_run_reaches_rich_path():
    # _para_text's iter() walk reaches a w:t that sits directly under
    # the paragraph (malformed producers); the span walk must agree
    body = "<w:p><w:t>loose</w:t><w:r><w:t> run</w:t></w:r></w:p>"
    md = K.convert_docx_xml("s", _doc(body))
    assert md == "# s\n\nloose run\n\n"


def test_plain_paragraphs_byte_identical_to_legacy_walk():
    # documents using none of the new features must emit exactly the
    # pre-richness bytes (regression fence for every existing golden)
    from tool_documentsconverter_spark.sources.transcripts import (
        _DOCX_BLANKS,
        _DOCX_HEADINGS,
        _DOCX_TABLES,
    )

    for tpl in (_DOCX_HEADINGS, _DOCX_BLANKS, _DOCX_TABLES):
        payload = tpl.replace("{i}", "3")
        has_body, blocks, tables, raw = K._et_docx_parse(payload)
        for blk in blocks:
            assert blk[0] == "p"


def test_list_items_inside_spark_dispatch(spark):
    from tool_documentsconverter_spark.operators.extract_binary import (
        extract_documents,
    )

    df = spark.createDataFrame(
        [(1, make_rich_docx_bytes(1))], "doc_id long, payload binary"
    )
    row = extract_documents(df).collect()[0]
    assert row.status == "ok"
    assert row.md == rich_docx_expected_md("1", 1)
