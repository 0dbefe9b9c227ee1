"""Binary .docx extraction: real ZIP with styles.xml styleId->name
resolution, driven through the Spark binary-document operator.
Workbook bytes are hand-assembled; expected Markdown pinned literally.
"""

import io
import zipfile

from tool_documentsconverter_spark import kernels as K

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def make_docx() -> bytes:
    # real-world convention: pStyle carries the styleId ("Heading1"),
    # styles.xml maps it to the NAME ("heading 1"... python-docx
    # exposes builtin style names like "Heading 1")
    document = f"""<?xml version="1.0"?>
<w:document {W}><w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Title A</w:t></w:r></w:p>
<w:p><w:r><w:t>Body text.</w:t></w:r></w:p>
<w:p><w:pPr><w:pStyle w:val="Heading4"/></w:pPr><w:r><w:t>Deep</w:t></w:r></w:p>
<w:tbl><w:tr><w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>
<w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
</w:body></w:document>"""
    styles = f"""<?xml version="1.0"?>
<w:styles {W}>
  <w:style w:type="paragraph" w:styleId="Heading1">
    <w:name w:val="Heading 1"/>
  </w:style>
  <w:style w:type="paragraph" w:styleId="Heading4">
    <w:name w:val="Heading 4"/>
  </w:style>
</w:styles>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", document)
        z.writestr("word/styles.xml", styles)
    return buf.getvalue()


EXPECTED_MD = (
    "# doc-1\n\n"
    "# Title A\n\n"       # Heading1 -> "Heading 1" -> level 1
    "Body text.\n\n"
    "# Deep\n\n"          # Heading4 -> "Heading 4" -> level-1 quirk
    "\n|c1|c2|\n"
    "\n"
)


def test_convert_docx_bytes_with_style_map():
    assert K.convert_docx_bytes("doc-1", make_docx()) == EXPECTED_MD


def test_extract_document_bytes_dispatch():
    md, status, _ = K.extract_document_bytes("doc-1", make_docx())
    assert (md, status) == (EXPECTED_MD, K.OK)

    md, status, _ = K.extract_document_bytes("p", b"%PDF-1.4\nno streams")
    assert status == K.OK and md.startswith("# p\n\n```text\n")

    md, status, _ = K.extract_document_bytes("t", "plain é".encode())
    assert status == K.OK and "plain é" in md

    md, status, msg = K.extract_document_bytes("z", None)
    assert status == K.FAILED

    # a ZIP that is not a docx -> failed, isolated
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("something.txt", "x")
    md, status, msg = K.extract_document_bytes("b", buf.getvalue())
    assert status == K.FAILED and "word/document.xml" in msg


def test_spark_binary_extraction_operator(spark):
    from tool_documentsconverter_spark.operators.extract_binary import (
        extract_documents,
    )

    rows = [
        (1, make_docx(), ""),
        (2, b"%PDF-1.4\n1 0 obj\nstream\nBT (hi) Tj ET\nendstream\n", ""),
        (3, "plain text doc".encode(), ""),
        (4, b"\x00\x01garbage", "doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, fmt_hint string")
    got = {r.doc_id: r for r in extract_documents(df, hint_col="fmt_hint").collect()}
    assert got["1"].md == EXPECTED_MD.replace("doc-1", "1")
    assert "hi" in got["2"].md and got["2"].status == "ok"
    assert got["3"].status == "ok"
    assert got["4"].status == "failed"  # isolated, job completed
