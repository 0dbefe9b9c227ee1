"""HAND-written fixtures with HAND-typed expected output.

The docx_rich / pdf_layout parity oracles are construction-derived:
engine and oracle rebuild the same template, so a bug in the shared
fixture *generator* would pass both sides.  These goldens break that
symmetry: the DOCX ZIP parts (document.xml, styles.xml, numbering.xml,
rels) and the PDF content streams below are typed by hand straight
from the OOXML / PDF specs, and the expected Markdown is typed by hand
from the documented emission grammar (kernels.py module comment above
_ORDERED_NUMFMTS; reference docx_converter.py:73-96) — no call into
make_rich_docx_bytes / make_two_column_pdf anywhere in this file.
"""

import io
import zipfile

from tool_documentsconverter_spark import kernels as K

_WNS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_RNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

# -- hand-written OOXML parts ------------------------------------------------

_DOCUMENT_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<w:document xmlns:w="{_WNS}" xmlns:r="{_RNS}">
 <w:body>
  <w:p>
   <w:pPr><w:pStyle w:val="H2"/></w:pPr>
   <w:r><w:t>Setup</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>Install</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>Download</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>Unpack</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="2"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>really unpack</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>Configure</w:t></w:r>
  </w:p>
  <w:p>
   <w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="5"/></w:numPr></w:pPr>
   <w:r><w:t>Edit config</w:t></w:r>
  </w:p>
  <w:p>
   <w:r><w:t>See </w:t></w:r>
   <w:hyperlink r:id="rId7">
    <w:r><w:rPr><w:b/></w:rPr><w:t>the docs</w:t></w:r>
   </w:hyperlink>
   <w:r><w:t> for </w:t></w:r>
   <w:r><w:rPr><w:i/></w:rPr><w:t>details</w:t></w:r>
   <w:r><w:t>.</w:t></w:r>
  </w:p>
  <w:tbl>
   <w:tr>
    <w:tc><w:p><w:r><w:t>Alpha</w:t></w:r></w:p></w:tc>
    <w:tc><w:p><w:r><w:t>Beta</w:t></w:r></w:p></w:tc>
   </w:tr>
   <w:tr>
    <w:tc><w:p><w:r><w:t>Gamma</w:t></w:r></w:p></w:tc>
    <w:tc><w:p><w:r><w:t>Delta</w:t></w:r></w:p></w:tc>
   </w:tr>
  </w:tbl>
 </w:body>
</w:document>"""

_STYLES_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<w:styles xmlns:w="{_WNS}">
 <w:style w:type="paragraph" w:styleId="H2">
  <w:name w:val="Heading 2"/>
 </w:style>
</w:styles>"""

# numId 5 resolves via abstractNumId 10 (the 2-hop Word applies):
# level 0 decimal, level 1 lowerLetter (an ORDERED fmt -> 'N.'
# markers), level 2 bullet
_NUMBERING_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<w:numbering xmlns:w="{_WNS}">
 <w:abstractNum w:abstractNumId="10">
  <w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>
  <w:lvl w:ilvl="1"><w:numFmt w:val="lowerLetter"/></w:lvl>
  <w:lvl w:ilvl="2"><w:numFmt w:val="bullet"/></w:lvl>
 </w:abstractNum>
 <w:num w:numId="5"><w:abstractNumId w:val="10"/></w:num>
</w:numbering>"""

_RELS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId7"
  Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink"
  Target="https://example.org/docs" TargetMode="External"/>
</Relationships>"""


def _hand_docx() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", _DOCUMENT_XML)
        zf.writestr("word/styles.xml", _STYLES_XML)
        zf.writestr("word/numbering.xml", _NUMBERING_XML)
        zf.writestr("word/_rels/document.xml.rels", _RELS_XML)
    return buf.getvalue()


# Hand-typed from the grammar: title, resolved Heading 2, nested
# ordered list whose level-1 counter RESTARTS at 'Configure' (a
# shallower level of the same numId advanced), paragraph closing the
# list, merged emphasis + rels-resolved link, table last with no
# separator row.
_EXPECTED_MD = (
    "# hand\n\n"
    "## Setup\n\n"
    "1. Install\n"
    "    1. Download\n"
    "    2. Unpack\n"
    "        - really unpack\n"
    "2. Configure\n"
    "    1. Edit config\n"
    "\n"
    "See [**the docs**](https://example.org/docs) for *details*.\n\n"
    "\n|Alpha|Beta|\n"
    "Gamma|Delta|\n"
    "\n"
)


def test_hand_written_docx_zip_golden():
    assert K.convert_docx_bytes("hand", _hand_docx()) == _EXPECTED_MD


def test_hand_written_docx_numbering_two_hop_resolves():
    zf = zipfile.ZipFile(io.BytesIO(_hand_docx()))
    assert K.docx_numbering_map(zf) == {
        "5": {0: "decimal", 1: "lowerLetter", 2: "bullet"}}
    assert K.docx_style_map(zf) == {"H2": "Heading 2"}


# -- hand-written PDF content streams ----------------------------------------

def test_hand_written_three_column_pdf():
    """Stream writes the columns middle, right, left; reading order
    (y desc, x asc) must interleave rows left-to-right."""
    s = (
        "BT 306 720 Td 14 TL (M1) Tj T* (M2) Tj ET "
        "BT 540 720 Td 14 TL (R1) Tj T* (R2) Tj ET "
        "BT 72 720 Td 14 TL (L1) Tj T* (L2) Tj ET"
    )
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "L1\nM1\nR1\nL2\nM2\nR2"


def test_hand_written_tm_matrix_three_columns():
    """Same 3-column shape through Tm (set matrix) instead of Td/T*,
    rows written bottom-up per column: positions alone must decide."""
    s = (
        "BT 1 0 0 1 306 706 Tm (M2) Tj 1 0 0 1 306 720 Tm (M1) Tj "
        "1 0 0 1 540 706 Tm (R2) Tj 1 0 0 1 540 720 Tm (R1) Tj "
        "1 0 0 1 72 706 Tm (L2) Tj 1 0 0 1 72 720 Tm (L1) Tj ET"
    )
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "L1\nM1\nR1\nL2\nM2\nR2"
