"""S8 md->pdf sink: the written PDF must be a valid, deterministic
document whose text round-trips through this repo's own PDF text
extractor (the strongest check available — the reference's external
renderer is not byte-reproducible by design)."""

from tool_documentsconverter_spark import kernels as K


def test_pdf_magic_and_structure():
    pdf = K.markdown_to_pdf_bytes("# Title\n\nbody line")
    assert pdf.startswith(b"%PDF-1.4\n")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"xref" in pdf and b"/Type /Catalog" in pdf


def test_roundtrip_through_own_extractor():
    md = "# Title\n\nfirst paragraph\nwith (parens) and \\backslash\n"
    pdf = K.markdown_to_pdf_bytes(md)
    text = K.extract_pdf_text(pdf.decode("latin-1"))
    assert text == md  # byte-exact round trip


def test_deterministic_bytes():
    md = "same input\nsame output"
    assert K.markdown_to_pdf_bytes(md) == K.markdown_to_pdf_bytes(md)


def test_pagination():
    md = "\n".join(f"line {i}" for i in range(100))  # > 46 lines
    pdf = K.markdown_to_pdf_bytes(md)
    assert pdf.count(b"/Type /Page ") == 3  # 46+46+8
    text = K.extract_pdf_text(pdf.decode("latin-1"))
    # pages joined with \n\n by the extractor; all lines survive
    flat = [l for l in text.splitlines() if l]
    assert flat[0] == "line 0" and flat[-1] == "line 99"
    assert len(flat) == 100


def test_multipage_roundtrip_is_newline_exact():
    """Pagination is invisible to the round trip: continuation pages
    open with a %cont stream comment, so the extractor joins them with
    '\\n' (not the '\\n\\n' paragraph join used for unmarked page
    breaks) and multi-page output round-trips byte-equal."""
    md = "\n".join(f"line {i}" for i in range(100))  # 3 pages: 46+46+8
    pdf = K.markdown_to_pdf_bytes(md)
    assert pdf.count(b"%cont") == 2  # pages 2 and 3 are continuations
    assert K.extract_pdf_text(pdf.decode("latin-1")) == md
    # boundary: exactly 46 lines is still one page, no marker
    md1 = "\n".join(f"l{i}" for i in range(46))
    pdf1 = K.markdown_to_pdf_bytes(md1)
    assert b"%cont" not in pdf1
    assert K.extract_pdf_text(pdf1.decode("latin-1")) == md1
    # foreign multi-stream PDFs (no marker) keep the paragraph join
    two = ("%PDF-1.4\nstream\nBT (a) Tj ET\nendstream\n"
           "stream\nBT (b) Tj ET\nendstream\n")
    assert K.extract_pdf_text(two) == "a\n\nb"


def test_unicode_roundtrips_via_cid_hex():
    """CJK (the reference corpus's own language), emoji, and mixed
    lines survive the PDF sink byte-exact: non-latin-1 lines are
    written as UTF-16BE hex strings under the Identity-H CID font."""
    for md in ("中文段落：你好，世界\nascii line\n混合 mixed 行",
               "🚀 emoji → astral pair",
               "# 标题\n\n```text\n正文 body\n```"):
        pdf = K.markdown_to_pdf_bytes(md)
        assert K.extract_pdf_text(pdf.decode("latin-1")) == md
        # no '?' degradation in any PAGE content stream (the first
        # stream in the file is the ToUnicode CMap — skip it)
        for blob in pdf.split(b"\nstream\n")[2:]:
            assert b"?" not in blob.split(b"endstream")[0]
    # multi-page CJK: pagination + CID encoding compose
    big = "\n".join(f"第{i}行" for i in range(100))
    assert K.extract_pdf_text(
        K.markdown_to_pdf_bytes(big).decode("latin-1")) == big


def test_hex_decode_gated_on_identity_h_declaration():
    # WITHOUT /Identity-H in the document, hex strings are single-byte
    # font codes: <48656C6C> is 'Hell', not UTF-16BE mojibake '䡥汬'
    s = "BT <48656C6C> Tj ET"
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    assert K.extract_pdf_text(pdf) == "Hell"
    # WITH the declaration, even-length runs are UTF-16BE (whitespace
    # inside the hex string is legal and ignored)
    s2 = "BT <4F60 597D> Tj ET"  # UTF-16BE for 你好
    pdf2 = ("%PDF-1.4\n1 0 obj << /Encoding /Identity-H >> endobj\n"
            f"stream\n{s2}\nendstream\n")
    assert K.extract_pdf_text(pdf2) == "你好"
    # odd byte runs are never UTF-16BE even when declared
    pdf3 = ("%PDF-1.4\n1 0 obj << /Encoding /Identity-H >> endobj\n"
            "stream\nBT <48656C6C6F> Tj ET\nendstream\n")
    assert K.extract_pdf_text(pdf3) == "Hello"
    # the whole Adobe UCS-2 CMap family counts as a 2-byte declaration,
    # not just Identity-H — a UniGB-UCS2-H (Chinese) PDF decodes CJK
    for enc in ("/UniGB-UCS2-H", "/UniJIS-UCS2-V", "/Identity-V"):
        pdfn = (f"%PDF-1.4\n1 0 obj << /Encoding {enc} >> endobj\n"
                f"stream\n{s2}\nendstream\n")
        assert K.extract_pdf_text(pdfn) == "你好", enc


def test_endstream_in_source_text_roundtrips():
    """A document whose TEXT contains the stream keywords used to
    truncate extraction at the embedded 'endstream' (silently losing
    the rest of the document); the writer now octal-escapes it."""
    md = "foo endstream bar\nstream\nendstreamendstream\ntail line"
    pdf = K.markdown_to_pdf_bytes(md)
    assert K.extract_pdf_text(pdf.decode("latin-1"),
                              force_stdlib=True) == md


def test_force_stdlib_skips_pdfminer_probe(monkeypatch):
    # the round-trip contract pins this repo's extractor even when
    # pdfminer is importable — simulate an installed pdfminer whose
    # output differs; the forced path must never call it (a pass with
    # pdfminer merely absent would not pin the gate at all)
    md = "# T\n\nplain"
    pdf = K.markdown_to_pdf_bytes(md).decode("latin-1")
    monkeypatch.setattr(K, "_PDFMINER",
                        lambda _fh: "PDFMINER LAYOUT TEXT")
    assert K.extract_pdf_text(pdf) == "PDFMINER LAYOUT TEXT"
    assert K.extract_pdf_text(pdf, force_stdlib=True) == md


def test_octal_escapes_unescape():
    s = r"BT (\145scaped \x \50paren\51 \764) Tj ET"
    pdf = f"%PDF-1.4\nstream\n{s}\nendstream\n"
    # \145='e', \x -> literal x (unknown escape keeps the char),
    # \50/\51 = parens, \764 = 0x1F4 masked to 0xF4
    assert K.extract_pdf_text(pdf) == "escaped \\x (paren) \xf4"


def test_xref_offsets_valid():
    pdf = K.markdown_to_pdf_bytes("a\nb\nc")
    # every xref entry must point at the "N 0 obj" it claims
    lines = pdf.split(b"xref\n")[1].splitlines()
    n = int(lines[0].split()[1])
    for i, entry in enumerate(lines[2:n + 1], start=1):
        off = int(entry.split()[0])
        assert pdf[off:off + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()


def test_spark_operator_roundtrip(spark):
    from tool_documentsconverter_spark.operators.md_pdf import (
        render_markdown_pdf,
    )

    rows = [("a", "# A\n\nalpha"), ("b", "# B\n\nbeta"), ("c", None)]
    df = spark.createDataFrame(rows, "stem string, md string")
    got = {r.stem: r for r in render_markdown_pdf(df).collect()}
    assert got["a"].status == "ok" and got["a"].n_pages == 1
    assert K.extract_pdf_text(bytes(got["b"].pdf).decode("latin-1")).startswith("# B")
    assert got["c"].status == "failed" and got["c"].pdf is None
