"""Real binary XLSX parsing (pure-stdlib ZIP+XML reader).

The workbook bytes are hand-assembled XML here — NOT produced by the
parser under test — and the expected CSV bytes are pinned literally,
so the reader cannot self-certify.
"""

import io
import zipfile

from tool_documentsconverter_spark import kernels as K

NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
RNS = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
       '2006/relationships"')


def make_xlsx() -> bytes:
    workbook = f"""<?xml version="1.0"?>
<workbook {NS} {RNS}>
  <sheets>
    <sheet name="Data" sheetId="1" r:id="rId1"/>
    <sheet name="数据/2" sheetId="2" r:id="rId2"/>
  </sheets>
</workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
  <Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    shared = f"""<?xml version="1.0"?>
<sst {NS} count="3" uniqueCount="3">
  <si><t>hello</t></si>
  <si><r><t>multi</t></r><r><t> run</t></r></si>
  <si><t>x,y</t></si>
</sst>"""
    # row 1: shared string, int, float; row 2: bool, formula w/ cached
    # value, empty gap then inline string in column D
    sheet1 = f"""<?xml version="1.0"?>
<worksheet {NS}>
  <sheetData>
    <row r="1">
      <c r="A1" t="s"><v>0</v></c>
      <c r="B1"><v>42</v></c>
      <c r="C1"><v>2.5</v></c>
    </row>
    <row r="2">
      <c r="A2" t="b"><v>1</v></c>
      <c r="B2"><f>6*7</f><v>42</v></c>
      <c r="D2" t="inlineStr"><is><t>inline</t></is></c>
    </row>
  </sheetData>
</worksheet>"""
    sheet2 = f"""<?xml version="1.0"?>
<worksheet {NS}>
  <sheetData>
    <row r="1"><c r="A1" t="s"><v>2</v></c><c r="B1" t="s"><v>1</v></c></row>
  </sheetData>
</worksheet>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)
    return buf.getvalue()


def test_parse_xlsx_bytes_values():
    sheets = K.parse_xlsx_bytes(make_xlsx())
    assert [n for n, _ in sheets] == ["Data", "数据/2"]
    rows = sheets[0][1]
    # padded to max column (D), openpyxl iter_rows style
    assert rows == [
        ["hello", 42, 2.5, None],
        [True, 42, None, "inline"],
    ]
    assert sheets[1][1] == [["x,y", "multi run"]]


def test_binary_workbook_to_csv_bytes():
    out = K.convert_workbook("book", make_xlsx())
    assert [n for n, _ in out] == ["book__Data.csv", "book__数据_2.csv"]
    # pinned bytes: str() coercion incl. bool 'True', formula cached
    # value, None -> "", CRLF, minimal quoting (xlsx_to_csv/main.py:94-104)
    assert out[0][1] == "hello,42,2.5,\r\nTrue,42,,inline\r\n"
    assert out[1][1] == '"x,y",multi run\r\n'


def test_binary_workbook_sheet_select():
    out = K.convert_workbook("book", make_xlsx(), sheet="Data")
    assert [n for n, _ in out] == ["book.csv"]  # --sheet -> plain name


def test_spark_operator_binary_payload(spark):
    from tool_documentsconverter_spark.operators.xlsx_csv import workbooks_to_csv

    df = spark.createDataFrame(
        [("book", make_xlsx())], "stem string, payload binary"
    )
    rows = sorted(workbooks_to_csv(df).collect(), key=lambda r: r.csv_name)
    assert [r.csv_name for r in rows] == ["book__Data.csv", "book__数据_2.csv"]
    assert rows[0].csv_text == "hello,42,2.5,\r\nTrue,42,,inline\r\n"
    assert all(r.status == "ok" for r in rows)
