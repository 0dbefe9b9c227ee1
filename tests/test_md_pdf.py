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


def test_multipage_roundtrip_is_honestly_lossy():
    """The documented contract: byte-exact round-trip ONLY while output
    is one page; at every 46-line page break the extractor's '\\n\\n'
    page join inserts one extra newline vs the source's '\\n'.  The
    md_pdf_roundtrip oracle predicts roundtrip_ok = (n_pages == 1) —
    this pins the behavior that prediction relies on."""
    md = "\n".join(f"line {i}" for i in range(100))  # 3 pages: 46+46+8
    pdf = K.markdown_to_pdf_bytes(md)
    back = K.extract_pdf_text(pdf.decode("latin-1"))
    assert back != md                      # lossy across page breaks...
    assert back.replace("\n\n", "\n") == md  # ...by exactly the page join
    # and the single-page claim stays byte-exact at the boundary (46
    # lines = 45 newlines -> still one page)
    md1 = "\n".join(f"l{i}" for i in range(46))
    assert K.extract_pdf_text(
        K.markdown_to_pdf_bytes(md1).decode("latin-1")) == md1


def test_unicode_degrades_not_crashes():
    pdf = K.markdown_to_pdf_bytes("中文 🚀 ok")
    text = K.extract_pdf_text(pdf.decode("latin-1"))
    assert "ok" in text and "?" in text


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
