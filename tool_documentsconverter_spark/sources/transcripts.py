"""Deterministic synthetic transcripts (the north-rule input table).

Shape per BASELINE.json input_hint:
  (conv_id:string, turn_idx:int32, role:string, text:string,
   tool:string, ts:timestamp)

Payload cases cycle through the FIXTURES.md §3 catalog (P1..P10) so
every emission path and reference quirk is exercised.  Everything is a
pure function of the row index i (seed-free determinism), EXCEPT
turn_idx which is assigned with a row_number window so turns are
contiguous per conversation while generation order stays shuffled
(FIXTURES.md §1).  One conversation (`conv-00000`) receives ~30% of
all turns — the oversized-conversation skew the salted repartition in
plans/pipeline.py must absorb.

Generation is distributed (spark.range -> mapInArrow) so bench-scale
tables never bottleneck on the driver.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator, Tuple

import pyarrow as pa

from ..ole import make_min_doc_bytes

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool"]
TOOLS = ["", "bash", "browser", "pdf_reader"]
EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_DOCX_HEADINGS = (
    '<?xml version="1.0"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
    '<w:p><w:pPr><w:pStyle w:val="Heading 1"/></w:pPr><w:r><w:t>Intro {i}</w:t></w:r></w:p>'
    '<w:p><w:r><w:t>Body paragraph {i} with </w:t></w:r><w:r><w:t>two runs.</w:t></w:r></w:p>'
    '<w:p><w:pPr><w:pStyle w:val="Heading 2"/></w:pPr><w:r><w:t>Methods</w:t></w:r></w:p>'
    '<w:p><w:pPr><w:pStyle w:val="Heading 3"/></w:pPr><w:r><w:t>Details</w:t></w:r></w:p>'
    '<w:p><w:pPr><w:pStyle w:val="Heading 4"/></w:pPr><w:r><w:t>Deep section</w:t></w:r></w:p>'
    '<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>A title-styled line</w:t></w:r></w:p>'
    "</w:body></w:document>"
)

_DOCX_BLANKS = (
    '<?xml version="1.0"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
    "<w:p><w:r><w:t>first {i}</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>   </w:t></w:r></w:p>"
    "<w:p></w:p>"
    "<w:p><w:r><w:t>last {i}</w:t></w:r></w:p>"
    "</w:body></w:document>"
)

_DOCX_TABLES = (
    '<?xml version="1.0"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
    "<w:p><w:r><w:t>Before tables {i}</w:t></w:r></w:p>"
    "<w:tbl>"
    "<w:tr><w:tc><w:p><w:r><w:t>a|pipe</w:t></w:r></w:p></w:tc>"
    "<w:tc><w:p><w:r><w:t> b </w:t></w:r></w:p></w:tc></w:tr>"
    "<w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc>"
    "<w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc></w:tr>"
    "<w:tr><w:tc><w:p><w:r><w:t>e</w:t></w:r></w:p></w:tc>"
    "<w:tc><w:p><w:r><w:t>f</w:t></w:r></w:p></w:tc></w:tr>"
    "</w:tbl>"
    "<w:p><w:r><w:t>Between {i}</w:t></w:r></w:p>"
    "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>solo</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
    "</w:body></w:document>"
)

_DOCX_RAW = (
    '<?xml version="1.0"?>'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:p><w:r><w:t>loose run {i}</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>second run</w:t></w:r><w:r><w:t/></w:r></w:p>"
    "</w:document>"
)

_HTML = (
    "<!DOCTYPE html><html><head><title>t</title>"
    "<style>body {{ color: red }}</style></head><body>"
    '<nav><li><a href="/">Home</a></li><li><a href="/x">X</a></li></nav>'
    "<h1>Article {i}</h1>"
    "<p>Main content paragraph {i} long enough to keep.</p>"
    '<p><a href="/spam">click</a> <a href="/more">here</a> now</p>'
    "<ul><li>alpha {i}</li><li>beta</li></ul>"
    "<pre>code {i}\nline2</pre>"
    "<footer><p>copyright boilerplate</p></footer>"
    "</body></html>"
)


_RELS_NS = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument'
            '/2006/relationships"')
_W_NS = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml'
         '/2006/main"')


def make_rich_docx_bytes(i: int) -> bytes:
    """A real zipped .docx exercising the pandoc-class richness path
    (kernels E3): numbering.xml-resolved ordered + nested bullet lists,
    rels-resolved hyperlinks, an anchor link, and bold/italic runs
    split mid-word (the run-merge case).  Deterministic function of i
    so the DuckDB oracle can predict the converted Markdown
    byte-for-byte (the docx_rich CORRECTNESS query)."""
    import io
    import zipfile

    document = (
        '<?xml version="1.0"?>'
        f"<w:document {_W_NS} {_RELS_NS}><w:body>"
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        f"<w:r><w:t>Rich doc {i}</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/>'
        f"</w:numPr></w:pPr><w:r><w:t>Step one of {i}</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/>'
        "</w:numPr></w:pPr><w:r><w:t>Step two</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/>'
        "</w:numPr></w:pPr><w:r><w:t>Step three</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="2"/>'
        f"</w:numPr></w:pPr><w:r><w:t>alpha {i}</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="2"/>'
        "</w:numPr></w:pPr><w:r><w:t>beta nested</w:t></w:r></w:p>"
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="2"/>'
        "</w:numPr></w:pPr><w:r><w:t>gamma</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>plain </w:t></w:r>"
        "<w:r><w:rPr><w:b/></w:rPr><w:t>bo</w:t></w:r>"
        f"<w:r><w:rPr><w:b/></w:rPr><w:t>ld {i}</w:t></w:r>"
        "<w:r><w:t> mid </w:t></w:r>"
        "<w:r><w:rPr><w:i/></w:rPr><w:t>ital</w:t></w:r>"
        "<w:r><w:t> </w:t></w:r>"
        "<w:r><w:rPr><w:b/><w:i/></w:rPr><w:t>both</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>See </w:t></w:r>"
        '<w:hyperlink r:id="rId9"><w:r><w:rPr><w:b/></w:rPr>'
        f"<w:t>site {i}</w:t></w:r></w:hyperlink>"
        "<w:r><w:t> and </w:t></w:r>"
        '<w:hyperlink w:anchor="sec1"><w:r><w:t>jump</w:t></w:r>'
        "</w:hyperlink></w:p>"
        "</w:body></w:document>"
    )
    styles = (
        '<?xml version="1.0"?>'
        f"<w:styles {_W_NS}>"
        '<w:style w:type="paragraph" w:styleId="Heading1">'
        '<w:name w:val="Heading 1"/></w:style></w:styles>'
    )
    numbering = (
        '<?xml version="1.0"?>'
        f"<w:numbering {_W_NS}>"
        '<w:abstractNum w:abstractNumId="0">'
        '<w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>'
        "</w:abstractNum>"
        '<w:abstractNum w:abstractNumId="1">'
        '<w:lvl w:ilvl="0"><w:numFmt w:val="bullet"/></w:lvl>'
        '<w:lvl w:ilvl="1"><w:numFmt w:val="bullet"/></w:lvl>'
        "</w:abstractNum>"
        '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
        '<w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>'
        "</w:numbering>"
    )
    rels = (
        '<?xml version="1.0"?>'
        "<Relationships "
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'<Relationship Id="rId9" Target="https://example.com/d{i}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/hyperlink" TargetMode="External"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", document)
        z.writestr("word/styles.xml", styles)
        z.writestr("word/numbering.xml", numbering)
        z.writestr("word/_rels/document.xml.rels", rels)
    return buf.getvalue()


def rich_docx_expected_md(stem: str, i: int) -> str:
    """The byte-exact Markdown make_rich_docx_bytes(i) must convert to
    — the pytest golden AND the template the SQL oracle rebuilds."""
    return (
        f"# {stem}\n\n"
        f"# Rich doc {i}\n\n"
        f"1. Step one of {i}\n"
        "2. Step two\n"
        "3. Step three\n"
        f"- alpha {i}\n"
        "    - beta nested\n"
        "- gamma\n"
        "\n"
        f"plain **bold {i}** mid *ital* ***both***\n\n"
        f"See [**site {i}**](https://example.com/d{i}) and [jump](#sec1)\n\n"
    )


def make_two_column_pdf(i: int) -> str:
    """A one-page PDF whose content stream writes the RIGHT column
    (x=306) before the LEFT (x=72): stream order deliberately
    disagrees with reading order.  extract_pdf_text's layout sort
    (y desc, x asc) must emit
    'Left top {i}\\nRight top {i}\\nLeft bottom\\nRight bottom'."""
    s = (
        f"BT /F1 11 Tf 306 720 Td 14 TL (Right top {i}) Tj T* "
        "(Right bottom) Tj ET "
        f"BT 72 720 Td 14 TL (Left top {i}) Tj T* (Left bottom) Tj ET"
    )
    return (
        "%PDF-1.4\n"
        f"1 0 obj << /Length {len(s)} >>\nstream\n{s}\nendstream\nendobj\n"
        "%%EOF\n"
    )


def make_pdf(i: int) -> str:
    """Minimal 2-page uncompressed PDF text (string form)."""
    s1 = f"BT /F1 12 Tf 72 720 Td (Page one line {i}) Tj T* (second \\(escaped\\) line) Tj ET"
    s2 = f"BT [(Page two ) (of turn {i})] TJ ET"
    return (
        "%PDF-1.4\n"
        "1 0 obj << /Length "
        f"{len(s1)} >>\nstream\n{s1}\nendstream\nendobj\n"
        "2 0 obj << /Length "
        f"{len(s2)} >>\nstream\n{s2}\nendstream\nendobj\n"
        "%%EOF\n"
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def make_png_bytes(w: int, h: int) -> bytes:
    """A fully VALID minimal RGB PNG (correct CRCs, zlib IDAT of black
    pixels) — parse_image_header must read (w, h, 'RGB') from the
    IHDR, and a real Pillow build decodes it identically (the
    real-library parity suite reuses this fixture)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def make_jpeg_bytes(w: int, h: int) -> bytes:
    """A minimal JFIF byte stream: SOI + APP0 + SOF0 (3-component
    baseline frame header carrying the true dimensions) + EOI.  No
    entropy-coded scan — enough for every header parser (including
    Pillow's) to report (w, h, 'RGB')."""
    import struct

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif_bytes(w: int, h: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    import struct

    return (b"GIF89a" + struct.pack("<HH", w, h)
            + b"\x70\x00\x00" + b"\x3b")


def make_wav_bytes(sample_rate: int, channels: int, bits: int,
                   n_samples: int) -> bytes:
    """A fully VALID RIFF/WAVE file (PCM fmt chunk + zeroed data
    chunk) — parse_audio_header must read back exactly these
    parameters, and any real audio library decodes it identically."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = bytes(n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_flac_bytes(sample_rate: int, channels: int, bits: int,
                    total_samples: int) -> bytes:
    """fLaC marker + a single (last) STREAMINFO metadata block with
    the given stream parameters bit-packed per the FLAC spec."""
    import struct

    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | total_samples)
    body = (struct.pack(">HH", 1024, 1024)      # min/max blocksize
            + b"\x00\x00\x00" * 2               # min/max framesize
            + packed.to_bytes(8, "big")
            + bytes(16))                        # md5 of zero samples
    return b"fLaC" + b"\x80" + len(body).to_bytes(3, "big") + body


def make_mp3_bytes(bitrate_kbps: int, sample_rate: int, channels: int,
                   n_frames: int, with_id3: bool = False) -> bytes:
    """MPEG1 Layer III CBR frames (header sync + zero payload), with
    an optional 20-byte ID3v2 tag (10-byte header + 10-byte body,
    syncsafe size) so the tag-skip path is exercised.  Frame size =
    144 * bitrate / sample_rate (padding bit clear) — the duration a
    header-only parser estimates is exactly
    (n_frames * frame_size) * 8000 // (bitrate_kbps * 1000)."""
    from ..operators.multimodal import _MP3_BITRATES, _MP3_RATES

    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(sample_rate)
    hdr = bytes([
        0xFF,
        0xFB,                                   # MPEG1 Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2),          # bitrate/samplerate, pad=0
        (0xC0 if channels == 1 else 0x00),      # mono vs stereo
    ])
    frame_size = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + bytes(frame_size - 4)
    tag = (b"ID3\x03\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
           if with_id3 else b"")
    return tag + frame * n_frames


def payload_for(i: int, mix: str = "fixtures") -> Tuple[str, str]:
    """(text, fmt_hint) for row index i.

    mix='fixtures': the P1..P10 cycle — every emission path each 10
    rows (correctness-oriented; 60% structured payloads, ~6x more
    parse-heavy than a real corpus).
    mix='realistic': 90% plain text, 10% structured — the throughput
    profile of an actual transcript corpus (most turns are prose/tool
    output; documents are the exception).
    """
    if mix == "realistic":
        c = i % 100
        if c < 90:
            return (
                f"Assistant turn {i}: analysis paragraph with enough prose "
                f"to look like a real reply.\n\nSecond paragraph {i % 7}.",
                "",
            )
        if c < 93:
            return (_DOCX_HEADINGS.replace("{i}", str(i)), "")
        if c < 94:
            return (
                make_min_doc_bytes(f"Legacy memo {i}.\rBody.").decode("latin-1"),
                "",
            )
        if c < 96:
            return (make_pdf(i), "")
        if c < 98:
            return (_HTML.replace("{i}", str(i)), "")
        if c < 99:
            return ("", "")
        return (f"\x00\x01BINARYGARBAGE{i}", "doc")
    case = i % 10
    if case == 0:  # P1 plain multi-paragraph, CJK + emoji
        return (
            f"Plain paragraph one of turn {i}.\n\n中文段落 🚀 emoji.\n\n"
            f"Final paragraph {i}.",
            "",
        )
    if case == 1:  # P2 empty / whitespace-only
        return ("" if i % 20 == 1 else " \n \t ", "")
    if case == 2:  # P3 heading classifier
        return (_DOCX_HEADINGS.replace("{i}", str(i)), "")
    if case == 3:  # P4 blank-paragraph drop
        return (_DOCX_BLANKS.replace("{i}", str(i)), "")
    if case == 4:  # P5 table quirk emission
        return (_DOCX_TABLES.replace("{i}", str(i)), "")
    if case == 5:  # P6 raw-XML fallback
        return (_DOCX_RAW.replace("{i}", str(i)), "")
    if case == 6:  # P7 pdf
        return (make_pdf(i), "")
    if case == 7:  # P8 html with boilerplate
        return (_HTML.replace("{i}", str(i)), "")
    if case == 8:  # P9 declared .doc that isn't OLE2 -> failed row
        return (f"\x00\x01BINARYGARBAGE{i}", "doc")
    if i % 20 == 19:  # P11 real legacy .doc (OLE2 bytes as latin-1 str)
        return (
            make_min_doc_bytes(
                f"Legacy Word body {i}.\rSecond paragraph."
            ).decode("latin-1"),
            "",
        )
    # P10: plain text again, exercised with hint column agreement
    return (f"hinted text payload {i}", "text")


def conv_for(i: int, n_convs: int) -> str:
    """~30% of turns land in conv-00000 (the oversized conversation)."""
    if i % 10 < 3:
        return "conv-00000"
    return f"conv-{1 + (i * 2654435761) % (n_convs - 1):05d}"


def _gen_factory(n_convs: int, mix: str = "fixtures"):
    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_pylist()
            rows = {
                "i": ids,
                "conv_id": [conv_for(i, n_convs) for i in ids],
                "role": [ROLES[i % 3] for i in ids],
                "tool": [TOOLS[i % 4] for i in ids],
                "text": [],
                "fmt_hint": [],
                "ts": [EPOCH + dt.timedelta(seconds=13 * i) for i in ids],
            }
            for i in ids:
                t, h = payload_for(i, mix)
                rows["text"].append(t)
                rows["fmt_hint"].append(h)
            yield pa.RecordBatch.from_pydict(rows)

    return gen


def synth_transcripts(spark: SparkSession, n_turns: int,
                      n_convs: int | None = None,
                      partitions: int | None = None,
                      mix: str = "fixtures") -> DataFrame:
    if n_convs is None:
        n_convs = max(4, n_turns // 40)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = spark.range(0, n_turns, 1, partitions)
    schema = ("i long, conv_id string, role string, tool string, "
              "text string, fmt_hint string, ts timestamp")
    raw = base.mapInArrow(_gen_factory(n_convs, mix), schema)
    w = Window.partitionBy("conv_id").orderBy("i")
    return (
        raw.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "fmt_hint")
    )


def write_transcripts(spark: SparkSession, path: str, n_turns: int,
                      n_convs: int | None = None,
                      mix: str = "fixtures",
                      partitions: int | None = None) -> None:
    """Write the synthetic table the way a real ingest would: evenly
    size-targeted files.  Without the round-robin repartition the files
    inherit the turn_idx window's conv_id partitioning, so the
    oversized conversation lands in ONE parquet file ≈ 30% of all
    bytes — and since a parquet row group is unsplittable, every
    downstream scan gets a straggler task that caps scan parallelism
    no matter how many executors exist.  (Row-level skew stays: the
    heavy conversation is still 30% of ROWS — that is the salted
    repartition's job — but no single FILE is.)"""
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    df = synth_transcripts(spark, n_turns, n_convs, mix=mix)
    df.repartition(partitions).write.mode("overwrite").parquet(path)
