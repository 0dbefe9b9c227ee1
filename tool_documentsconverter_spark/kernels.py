"""Pure-Python extraction kernels — the single source of truth for
per-format conversion semantics.

These functions are imported BOTH by the Spark executors (inside the
Arrow-batch extraction stage, ``operators/extract.py``) and by the
driver-side oracle used in tests, so the distributed pipeline and the
reference semantics cannot drift apart.  Every template below is a
transcription of a cited behavior of the reference repo
(``EarthTan/tool-documentsConverter``, read-only at /root/reference) —
see the per-function docstrings for file:line citations.

Nothing in this module touches Spark: plain str -> str functions over
one logical "document" (a transcript turn's payload).  Vectorization
happens one level up (Arrow batches); these kernels are cheap
stdlib-only string/XML work, so per-element calls inside a batch are
fine (the expensive boundary — Python<->JVM — is already amortized).
"""

from __future__ import annotations

import csv
import io
import json
import re
import zipfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import List, Optional, Tuple

# --------------------------------------------------------------------------
# Status vocabulary (mirror of TaskResult.status, doc_to_md/main.py:48-56)
# --------------------------------------------------------------------------
OK = "ok"
SKIPPED = "skipped"
FAILED = "failed"

# message tails: stderr/stdout kept to last 1200/600 chars
# (doc_to_md/main.py:375-376)
MESSAGE_TAIL = 1200

_SANITIZE_CHARS = ['/', '\\', ':', '*', '?', '"', '<', '>', '|']
_SANITIZE_TABLE = str.maketrans({c: "_" for c in _SANITIZE_CHARS})


def sanitize_stem(name: str, default: str = "document") -> str:
    """Filename-sanitize: replace ``/\\:*?"<>|`` with ``_``, strip,
    fall back to a default.  Reference: ``safe_stem``
    (doc_to_md/main.py:244-249) and ``_sanitize_filename``
    (xlsx_to_csv/main.py:64-67, default "sheet").  One-pass
    str.translate — this runs per turn in the hot path."""
    return name.translate(_SANITIZE_TABLE).strip() or default


def turn_stem(conv_id: str, turn_idx: int) -> str:
    """Title key for a transcript turn.  The reference titles output by
    file stem (e.g. pdf_converter.py:32); rows in a table have no file,
    so the pinned convention (FIXTURES.md §1) is
    ``{conv_id}_{turn_idx:05d}`` run through the sanitizer."""
    return sanitize_stem(f"{conv_id}_{turn_idx:05d}")


# --------------------------------------------------------------------------
# Format sniffing (north_star upgrade of the reference's suffix dispatch,
# doc_to_md/main.py:184-192: byte-stream magic instead of file suffix)
# --------------------------------------------------------------------------
FMT_TEXT = "text"
FMT_PDF = "pdf"
FMT_DOCX = "docx"
FMT_DOC = "doc"
FMT_HTML = "html"
FMT_UNKNOWN = "unknown"

KNOWN_FMTS = (FMT_TEXT, FMT_PDF, FMT_DOCX, FMT_DOC, FMT_HTML)

# OLE2 compound-file magic as latin-1 text (binary .doc payloads ride
# the string column latin-1-decoded; latin-1 is bijective over 0-255)
OLE_MAGIC_STR = "\xd0\xcf\x11\xe0"


def sniff_format(payload: str, fmt_hint: str = "") -> str:
    """Magic-prefix format detection over a text payload.

    ``%PDF-`` -> pdf; OLE2 magic -> legacy doc; OOXML
    (``<?xml``/``<w:document``) -> docx; ``<html``/``<!doctype``
    (case-insensitive, leading ws ignored) -> html; otherwise the
    metadata hint column wins if it names a known format
    (suffix-dispatch fallback, doc_to_md/main.py:184-192); else plain
    text.
    """
    if payload is None:
        return FMT_UNKNOWN
    head = payload[:512]
    if head.startswith("%PDF-"):
        return FMT_PDF
    if head.startswith(OLE_MAGIC_STR):
        return FMT_DOC
    stripped = head.lstrip()
    low = stripped[:64].lower()
    if stripped.startswith("<?xml") or stripped.startswith("<w:document"):
        if "<w:" in head:
            return FMT_DOCX
        return FMT_HTML if "<html" in low else FMT_UNKNOWN
    if low.startswith("<!doctype") or low.startswith("<html"):
        return FMT_HTML
    if fmt_hint in KNOWN_FMTS:
        return fmt_hint
    if fmt_hint and fmt_hint not in KNOWN_FMTS and fmt_hint != "":
        # unknown declared format, unknown magic -> unsupported
        # (mirror of ValueError path, doc_to_md/main.py:192)
        return FMT_UNKNOWN
    return FMT_TEXT


# --------------------------------------------------------------------------
# E8 — plain-text -> Markdown wrap
# --------------------------------------------------------------------------
def wrap_text_md(stem: str, text: str) -> str:
    """``# {stem}\\n\\n```text\\n{text}\\n```\\n`` — exact template of
    doc_to_md/pdf_converter.py:30-35 / doc_to_md/main.py:395-403 /
    docx_converter.py:124-133 (the fenced-code plain-text wrap)."""
    return f"# {stem}\n\n```text\n{text}\n```\n"


# --------------------------------------------------------------------------
# E1 — PDF text extraction
# --------------------------------------------------------------------------
_PDF_STREAM_RE = re.compile(r"stream\r?\n(.*?)endstream", re.DOTALL)
_PDF_TJ_ARRAY_RE = re.compile(r"\[(.*?)\]\s*TJ", re.DOTALL)
# one in-order pass over both text-showing ops: group(1) set => TJ
# array, else a (..) Tj literal
_PDF_TEXTOP_RE = re.compile(
    r"\[(.*?)\]\s*TJ|\((?:[^()\\]|\\.)*\)\s*Tj", re.DOTALL
)
# Deliberately LOOSE number class: it also matches invalid float
# literals ("1.2.3", ".", "-"), so every float() in the dispatch below
# is guarded by try/except — a malformed positioning token skips that
# one op (text still extracts) instead of failing the document.  The
# valid-float grammar -?(?:[0-9]+\.?[0-9]*|\.[0-9]+) was measured ~5%
# slower on the whole PDF kernel (this regex runs at every digit
# position of every stream); the guard costs nothing on the valid
# path.
_NUM = r"-?[0-9.]+"
# text-showing ops PLUS the positioning operators that drive reading
# order: Td/TD (line translate), Tm (set matrix; e,f = x,y), TL
# (leading), T* (next line), BT (reset text matrix).  Branch order and
# shape tuned for scan speed (this regex runs on every PDF turn):
# string literals first (they consume the most characters), loose
# number class (floats only need ordering, not validation), and the
# dispatch in extract_pdf_text reads match.lastgroup once instead of
# probing every named group.
_PDF_LAYOUT_RE = re.compile(
    r"\((?P<tjlit>(?:[^()\\]|\\.)*)\)\s*Tj"
    r"|<(?P<tjhex>[0-9A-Fa-f\s]*)>\s*Tj"
    r"|\[(?P<tj>.*?)\]\s*TJ"
    rf"|(?P<tdx>{_NUM})\s+(?P<tdy>{_NUM})\s+(?P<td>Td|TD)"
    rf"|(?P<tm>{_NUM}(?:\s+{_NUM}){{5}})\s+Tm"
    rf"|(?P<tl>{_NUM})\s+TL"
    r"|(?P<tstar>T\*)"
    r"|(?P<bt>BT)",
    re.DOTALL,
)
_PDFMINER = None  # one-shot import probe cache (None=unprobed, False=absent)
# Markers that a document's hex strings carry 2-byte (UCS-2/UTF-16BE-
# compatible) codes: Identity-H/V plus the Adobe UCS-2 CMap family
# (UniGB/UniJIS/UniKS/UniCNS-UCS2-H/V).  Scoped to an ``/Encoding``
# key so the name must appear as a font dictionary's declared encoding
# (``/Encoding /Identity-H``, exactly what this repo's CID sink and
# every conforming producer emit) — a page whose TEXT merely mentions
# 'Identity-H' no longer flips every even-length hex string in the
# document to UTF-16BE.  Still a document-global flag rather than
# per-font state: the uncompressed-fallback scanner deliberately does
# not track which font is active at each text op.
# two accepted contexts: the direct form '/Encoding /Identity-H'
# (what this repo's sink and most producers emit) and the indirect
# form '/Encoding 12 0 R' whose referenced object body is
# '12 0 obj /Identity-H' — 'obj' immediately preceding the CMap name
# marks exactly that resolution without reviving the payload-global
# false positive (prose mentioning 'Identity-H' matches neither).
_PDF_UTF16_MARK_RE = re.compile(
    r"(?:/Encoding\s*|\bobj\s*)"
    r"/(?:Identity-[HV]|Uni(?:GB|JIS|KS|CNS)-UCS2-[HV])")


_PDF_PAREN_SPECIAL_RE = re.compile(r"[\\()]")


def _pdf_unescape(s: str) -> str:
    if "\\" not in s:  # fast path: nothing to unescape
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in "()\\":
                out.append(nxt)
                i += 2
                continue
            if nxt == "n":
                out.append("\n")
                i += 2
                continue
            if nxt == "t":
                out.append("\t")
                i += 2
                continue
            if nxt in "01234567":  # octal escape \d, \dd, or \ddd
                j = i + 1
                while j < min(i + 4, len(s)) and s[j] in "01234567":
                    j += 1
                out.append(chr(int(s[i + 1:j], 8) & 0xFF))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _pdf_hex_text(hx: str, utf16: bool) -> str:
    """Decode a PDF hex string ``<...>``.  ``utf16`` says whether this
    DOCUMENT declares an ``/Identity-H`` CID encoding (the caller
    checks once per payload): only then are even-length byte runs read
    as UTF-16BE — the encoding this repo's CID sink writes, declared
    code==Unicode by its ToUnicode CMap.  Without that declaration the
    bytes are a single-byte font's codes and decode per-byte latin-1;
    guessing UTF-16BE there would turn ordinary ASCII hex strings
    (``<48656C6C>``) into CJK mojibake — and the reverse guess would
    shred this sink's CJK (你好 = ``4F60 597D``, four bytes that are
    ALL printable ASCII, so no content heuristic can distinguish the
    two cases; the font declaration can)."""
    hx = "".join(hx.split())
    if len(hx) % 2:
        hx += "0"  # PDF 1.7 §7.3.4.3: odd final digit implies a 0
    b = bytes.fromhex(hx)
    if utf16 and len(b) % 2 == 0:
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return b.decode("latin-1")


def _pdf_paren_strings(chunk: str) -> List[str]:
    """All (...) literal strings in a content-stream chunk, in stream
    order, honoring backslash escapes and nested parens.  Scans with
    ``str.find``/regex span jumps instead of per-character Python
    (round-8 micro-opt; behavior byte-identical, including trailing
    backslashes and unterminated strings)."""
    res: List[str] = []
    n = len(chunk)
    find = chunk.find
    special = _PDF_PAREN_SPECIAL_RE.search
    i = find("(")
    while i != -1:
        depth = 1
        j = i + 1
        buf = []
        while True:
            m = special(chunk, j)
            if m is None:  # unterminated string: rest is content
                buf.append(chunk[j:])
                j = n
                break
            k = m.start()
            c = chunk[k]
            if c == "\\":
                buf.append(chunk[j:k])
                if k + 1 < n:
                    buf.append(chunk[k:k + 2])  # keep escape pair verbatim
                    j = k + 2
                else:  # trailing backslash at chunk end
                    buf.append(c)
                    j = k + 1
                continue
            if c == "(":
                depth += 1
                buf.append(chunk[j:k + 1])
                j = k + 1
                continue
            depth -= 1  # c == ")"
            if depth == 0:
                buf.append(chunk[j:k])
                j = k
                break
            buf.append(chunk[j:k + 1])
            j = k + 1
        res.append(_pdf_unescape("".join(buf)))
        i = find("(", j + 1)
    return res


def extract_pdf_text(payload: str, force_stdlib: bool = False) -> str:
    """Text extraction from a (simple, uncompressed) PDF byte-stream.

    The reference delegates to ``pdfminer.high_level.extract_text``
    (doc_to_md/pdf_converter.py:25-27), and its priority-1 tool is
    marker (doc_to_md/main.py:124-143, config.yaml priority list) —
    both produce LAYOUT-ordered text, not stream-ordered text.
    pdfminer is not installed in this sandbox, so when an import-try
    fails we fall back to a deterministic pure-stdlib extractor for
    uncompressed PDFs that reproduces the layout intent: per content
    stream, the text matrix is tracked through the positioning
    operators (``Td``/``TD`` translate, ``Tm`` set, ``TL`` leading,
    ``T*`` next-line, ``BT`` reset), and every text-showing op
    (``(..) Tj`` / ``<hex> Tj`` / ``[..] TJ``) is emitted as one line
    in READING order — top-to-bottom (y desc), left-to-right (x asc),
    stream order as the stable tie-break — so a page whose stream
    writes the right column before the left still reads correctly.
    Hex strings decode as UTF-16BE only when the document declares an
    ``/Identity-H`` encoding (this repo's CID sink does), latin-1
    otherwise — see _pdf_hex_text.  Lines joined with ``\\n``; streams
    (pages) joined with ``\\n\\n``, except streams opening with the
    ``%cont`` pagination marker, which continue the previous page's
    line block with a single ``\\n``.  Rotation
    and column-first (newspaper) segmentation are out of scope —
    documented limitation; at production scale with pdfminer installed
    the real-library path is used and the fixtures are regenerated
    against it (SURVEY.md §7 hard-part (a)).

    ``force_stdlib=True`` skips the pdfminer probe: the byte-exact
    md→PDF round-trip contract (markdown_to_pdf_bytes' docstring, the
    md_pdf_roundtrip oracle) is a property of THIS writer/extractor
    pair — pdfminer produces its own layout text (form-feed page
    joins, layout whitespace), which is correct extraction but not
    byte-contractual, so round-trip checks must pin the stdlib pair.
    """
    global _PDFMINER
    if _PDFMINER is None:  # probe the real library exactly once
        try:
            from pdfminer.high_level import extract_text  # type: ignore

            _PDFMINER = extract_text
        except ImportError:
            _PDFMINER = False
    if _PDFMINER and not force_stdlib:
        return _PDFMINER(io.BytesIO(payload.encode("latin-1", "replace")))
    utf16_hex = bool(_PDF_UTF16_MARK_RE.search(payload))
    pages: List[str] = []
    for m in _PDF_STREAM_RE.finditer(payload):
        chunk = m.group(1)
        ops: List[tuple] = []  # (y, x, seq, text)
        x = y = tl = 0.0
        seq = 0
        for t in _PDF_LAYOUT_RE.finditer(chunk):
            g = t.lastgroup
            if g == "tjlit":
                text = t.group("tjlit")
                if "\\" in text:
                    text = _pdf_unescape(text)
                ops.append((y, x, seq, text))
                seq += 1
            elif g == "tjhex":
                ops.append((y, x, seq,
                            _pdf_hex_text(t.group("tjhex"), utf16_hex)))
                seq += 1
            elif g == "tj":
                parts = _pdf_paren_strings(t.group("tj"))
                if parts:
                    ops.append((y, x, seq, "".join(parts)))
                    seq += 1
            elif g == "td":
                try:  # loose _NUM class: see its comment
                    dx, ty = float(t.group("tdx")), float(t.group("tdy"))
                except ValueError:
                    continue  # malformed op: skip, keep the text
                x += dx
                y += ty
                if t.group("td") == "TD":  # TD also sets leading = -ty
                    tl = -ty
            elif g == "tm":
                nums = t.group("tm").split()
                try:
                    x, y = float(nums[4]), float(nums[5])
                except ValueError:
                    continue
            elif g == "tl":
                try:
                    tl = float(t.group("tl"))
                except ValueError:
                    continue
            elif g == "tstar":
                y -= tl
            elif g == "bt":
                x = y = 0.0  # BT resets the text matrix; TL persists
        if ops:
            ops.sort(key=lambda o: (-o[0], o[1], o[2]))
            text = "\n".join(o[3] for o in ops)
            # a %cont comment opening the stream marks a PAGINATION
            # continuation (this repo's own sink writes it): the page
            # continues the previous line block, so join with '\n' —
            # unmarked page breaks keep the '\n\n' paragraph join
            if pages and chunk.lstrip().startswith(_PDF_CONT_MARKER):
                pages[-1] = pages[-1] + "\n" + text
            else:
                pages.append(text)
    return "\n\n".join(pages)


def convert_pdf(stem: str, payload: str) -> str:
    """E1+E8: extract text, wrap (doc_to_md/pdf_converter.py:25-35)."""
    return wrap_text_md(stem, extract_pdf_text(payload))


# --------------------------------------------------------------------------
# E7 — legacy binary .doc (Word 97-2003)
# --------------------------------------------------------------------------
def convert_doc(stem: str, payload: bytes) -> str:
    """E7+E8: legacy ``.doc`` text -> fenced wrap.  The reference pipes
    ``.doc`` through antiword and wraps the text in the same template
    (docx_converter.py:107-142: ``# {stem}`` + ```text fence``;
    main.py:165-171 the antiword/catdoc command chain).  Extraction
    here is the pure-stdlib [MS-CFB]/[MS-DOC] reader in ole.py."""
    from .ole import extract_doc_text

    return wrap_text_md(stem, extract_doc_text(payload))


# --------------------------------------------------------------------------
# E4/E5/E6 — DOCX (OOXML) DOM traversal
# --------------------------------------------------------------------------
_LOCAL_CACHE: dict = {}


def _local(tag: str) -> str:
    # hot path: called once per XML element visit; the tag vocabulary
    # of a schema is tiny, so a memo dict beats rsplit ~5x.  Bounded in
    # BOTH entry count and entry size (4096 x <=256 chars ~= 1 MB
    # worst case): adversarial XML with unbounded distinct or huge tag
    # names falls back to the uncached path instead of pinning
    # arbitrary bytes in executor memory for the process lifetime.
    v = _LOCAL_CACHE.get(tag)
    if v is None:
        v = tag.rsplit("}", 1)[-1]
        if len(tag) <= 256 and len(_LOCAL_CACHE) < 4096:
            _LOCAL_CACHE[tag] = v
    return v


def _para_text(p_elem) -> str:
    """python-docx ``para.text``: concatenation of every w:t run.
    Hand-rolled loop with the _LOCAL_CACHE get inlined — this runs
    once per XML element of every paragraph, and the genexpr +
    per-element function call were ~40% of the docx kernel."""
    cache_get = _LOCAL_CACHE.get
    parts = []
    for t in p_elem.iter():
        tag = t.tag
        v = cache_get(tag)
        if v is None:
            v = _local(tag)
        if v == "t":
            x = t.text
            if x:
                parts.append(x)
    return "".join(parts)


def _para_style(p_elem, style_map: Optional[dict] = None) -> str:
    """Style name of a paragraph.  python-docx resolves styleId ->
    style name via styles.xml (style_map, used on the binary path);
    the string-payload fixture convention (FIXTURES.md §3 P3) carries
    the style NAME verbatim in ``w:pStyle/@w:val``.  Default 'Normal'.
    Scoped to w:pPr/w:pStyle (the only place the schema — and
    python-docx's paragraph.style — reads it), NOT a full-subtree
    walk: visiting every run of every paragraph for a property that
    lives in the first child was the single hottest line of the DOCX
    kernel."""
    for pr in p_elem:
        if _local(pr.tag) != "pPr":
            continue
        for el in pr:
            if _local(el.tag) == "pStyle":
                for k, v in el.attrib.items():
                    if _local(k) == "val":
                        if style_map:
                            return style_map.get(v, v)
                        return v
    return "Normal"


def heading_level(style_name: str) -> Optional[int]:
    """The reference's heading classifier (docx_converter.py:79-85):
    any style starting 'Heading' is a heading; level 2 only for exactly
    'Heading 2', 3 only for 'Heading 3', EVERYTHING ELSE (incl.
    Heading 4+) collapses to level 1.  Quirk reproduced, not fixed."""
    if not style_name.startswith("Heading"):
        return None
    if style_name == "Heading 2":
        return 2
    if style_name == "Heading 3":
        return 3
    return 1


# --------------------------------------------------------------------------
# E3 — pandoc-class inline/list richness
#
# The reference's PRIMARY DOCX path is pandoc (doc_to_md/main.py:147-149,
# docx_converter.py:37-63), which emits real Markdown structure: list
# items, hyperlinks, bold/italic emphasis.  The python-docx fallback
# surface (headings/paragraphs/quirk-tables) is reproduced above; the
# walkers below close the structured gap pure-stdlib, with a documented
# deterministic grammar (this engine's own, pandoc-flavored):
#   unordered item  ->  "- text",    nested by 4 spaces per w:ilvl
#   ordered item    ->  "N. text",   per-(numId, level) counters that
#                                    reset when a shallower level advances
#   hyperlink       ->  "[text](target)"  (r:id resolved via the rels
#                        map; w:anchor -> "#anchor"; unresolvable -> text)
#   bold/italic     ->  **t** / *t* / ***t***, adjacent same-format runs
#                        merged first (Word splits runs arbitrarily),
#                        edge whitespace moved OUTSIDE the markers
# --------------------------------------------------------------------------
_ORDERED_NUMFMTS = ("decimal", "lowerLetter", "upperLetter",
                    "lowerRoman", "upperRoman", "ordinal")


def _attr(el, name: str) -> Optional[str]:
    for k, v in el.attrib.items():
        if _local(k) == name:
            return v
    return None


def _run_flags(r_elem) -> Tuple[bool, bool]:
    """(bold, italic) of a w:r from its w:rPr — a bare <w:b/> is ON;
    the ST_OnOff off-values 'false'/'0'/'off' turn it off ('none' kept
    too: some producers emit the ST_Underline value here)."""
    bold = italic = False
    for el in r_elem:
        if _local(el.tag) != "rPr":
            continue
        for pr in el:
            tag = _local(pr.tag)
            if tag in ("b", "i"):
                val = _attr(pr, "val")
                on = val not in ("false", "0", "off", "none")
                if tag == "b":
                    bold = on
                else:
                    italic = on
    return bold, italic


def _collect_spans(elem, rels: Optional[dict]) -> List[tuple]:
    """Flatten a paragraph into inline parts, in document order:
    ("span", text, bold, italic) | ("link", target, [span parts]).
    Unknown containers recurse so every w:t is reached (the plain-text
    twin _para_text uses iter(); outputs must agree when no formatting
    or links are present)."""
    parts: List[tuple] = []
    for child in elem:
        tag = _local(child.tag)
        if tag == "r":
            bold, italic = _run_flags(child)
            text = "".join(t.text or "" for t in child.iter()
                           if _local(t.tag) == "t")
            if text:
                parts.append(("span", text, bold, italic))
        elif tag == "hyperlink":
            inner = _collect_spans(child, rels)
            rid = _attr(child, "id")
            anchor = _attr(child, "anchor")
            target = None
            if rid and rels:
                target = rels.get(rid)
            if target is None and anchor:
                target = f"#{anchor}"
            if target is None:
                parts.extend(inner)  # unresolvable: degrade to the text
            else:
                parts.append(("link", target, inner))
        elif tag == "t":
            # bare w:t outside any run (malformed producers); _para_text's
            # iter() walk reaches it, so the rich path must too
            if child.text:
                parts.append(("span", child.text, False, False))
        elif tag in ("pPr", "rPr"):
            continue
        else:  # smartTag / ins / field wrappers: recurse for the runs
            parts.extend(_collect_spans(child, rels))
    return parts


def _merge_spans(parts: List[tuple]) -> List[tuple]:
    """Merge ADJACENT spans with identical formatting: Word splits runs
    at arbitrary points ('bol' + 'd', both bold) and naive emission
    would produce '**bol****d**'."""
    out: List[tuple] = []
    for p in parts:
        if (p[0] == "span" and out and out[-1][0] == "span"
                and out[-1][2:] == p[2:]):
            out[-1] = ("span", out[-1][1] + p[1], p[2], p[3])
        else:
            out.append(p)
    return out


def _emit_span(text: str, bold: bool, italic: bool) -> str:
    if not (bold or italic) or not text.strip():
        return text
    lead = text[:len(text) - len(text.lstrip())]
    trail = text[len(text.rstrip()):]
    marker = "***" if bold and italic else ("**" if bold else "*")
    return f"{lead}{marker}{text.strip()}{marker}{trail}"


def _emit_inline(parts: List[tuple]) -> str:
    out: List[str] = []
    for p in _merge_spans(parts):
        if p[0] == "span":
            out.append(_emit_span(p[1], p[2], p[3]))
        else:  # link
            inner = _emit_inline(p[2])
            out.append(f"[{inner}]({p[1]})")
    return "".join(out)


def _para_inline_md(p_elem, rels: Optional[dict]) -> str:
    """Inline Markdown of a paragraph's runs (emphasis + links).
    Byte-identical to _para_text for paragraphs without formatting."""
    return _emit_inline(_collect_spans(p_elem, rels))


def _para_numpr(p_elem) -> Optional[Tuple[str, int]]:
    """(numId, ilvl) when the paragraph is a list item (w:pPr/w:numPr),
    else None."""
    for pr in p_elem:
        if _local(pr.tag) != "pPr":
            continue
        for el in pr:
            if _local(el.tag) != "numPr":
                continue
            num_id, ilvl = None, 0
            for n in el:
                tag = _local(n.tag)
                if tag == "numId":
                    num_id = _attr(n, "val")
                elif tag == "ilvl":
                    try:
                        ilvl = int(_attr(n, "val") or 0)
                    except ValueError:
                        ilvl = 0
            if num_id is not None:
                return num_id, ilvl
    return None


def _emit_docx(stem: str, has_body: bool, blocks, tables, raw_texts,
               numbering: Optional[dict] = None) -> str:
    """Markdown emission over parsed body blocks.

    blocks: [("p", style_name, inline_md)] paragraphs and
            [("li", num_id, ilvl, inline_md)] list items, in order;
    tables: [[[cell_text, ...], ...]] body-level tables in order;
    raw_texts: every w:t text when there is no body (E6 fallback);
    numbering: {numId: {ilvl: numFmt}} from numbering.xml — absent
    entries default to bullet.

    List grammar (module comment above _ORDERED_NUMFMTS): one line per
    item, 4-space indent per level, '-' bullets, 'N.' ordered markers
    with per-(numId, level) counters that reset every time a shallower
    level of the same numId advances; a blank line closes each list
    block, so paragraphs keep their '\\n\\n' rhythm.  Blank items are
    dropped like blank paragraphs (docx_converter.py:75-77) and a
    DROPPED blank paragraph never splits a list."""
    out = [f"# {stem}\n\n"]
    if not has_body:
        # E6 raw fallback: every }t text (docx_converter.py:168-176)
        out.append("\n".join(raw_texts))
        return "".join(out)
    counters: dict = {}
    in_list = False
    for blk in blocks:
        if blk[0] == "p":
            _, style, text = blk
            text = text.strip()
            if not text:  # blank-paragraph drop (docx_converter.py:75-77)
                continue
            if in_list:  # a real paragraph ends the open list block
                out.append("\n")
                in_list = False
            lvl = heading_level(style)
            if lvl is not None:
                out.append(f"{'#' * lvl} {text}\n\n")
            else:
                out.append(f"{text}\n\n")
        else:
            _, num_id, ilvl, text = blk
            text = text.strip()
            if not text:  # blank items drop like blank paragraphs
                continue
            fmt = "bullet"
            if numbering:
                fmt = numbering.get(num_id, {}).get(ilvl, "bullet")
            # any item at this level restarts its numId's deeper counters
            for k in [k for k in counters
                      if k[0] == num_id and k[1] > ilvl]:
                del counters[k]
            if fmt in _ORDERED_NUMFMTS:
                key = (num_id, ilvl)
                counters[key] = counters.get(key, 0) + 1
                marker = f"{counters[key]}."
            else:
                marker = "-"
            out.append(f"{'    ' * ilvl}{marker} {text}\n")
            in_list = True
    if in_list:
        out.append("\n")
    for rows in tables:  # tables AFTER all paragraphs (docx_converter.py:89-96)
        out.append("\n|")
        for cells in rows:
            row_text = "|".join(c.strip() for c in cells)
            out.append(f"{row_text}|\n")
        out.append("\n")
    return "".join(out)


# One substring scan decides whether the rich-inline machinery (lists,
# links, emphasis) can run at all: a document whose XML never mentions
# numPr/hyperlink/b/i cannot produce any of those spans, so its
# paragraphs take the cheap _para_text walk (documented invariant:
# _para_inline_md is byte-identical to _para_text when no formatting
# or links are present — pinned by tests/test_properties.py).  The
# prefix is matched as (anything):localname so producers using a
# namespace prefix other than w: still gate correctly; [ />] keeps
# <w:b from matching <w:body and <w:i from matching <w:ilvl/<w:ins.
# [\s/>] not [ />]: XML allows a tab/newline before the first
# attribute ('<w:b\n w:val="1"/>'), and missing it would silently
# drop that document's formatting via the plain path
_DOCX_RICH_RE = re.compile(
    r"<(?:[A-Za-z0-9._-]+:)?(?:numPr|hyperlink)[\s>/]"
    r"|<(?:[A-Za-z0-9._-]+:)?[bi][\s/>]"
)


def _et_docx_parse(payload: str, style_map: Optional[dict] = None,
                   rels: Optional[dict] = None):
    """Reference parser: ElementTree walk (the canonical semantics).
    Returns (has_body, blocks, tables, raw_texts) — see _emit_docx."""
    plain = _DOCX_RICH_RE.search(payload) is None
    root = ET.fromstring(payload)
    body = None
    for child in root:
        if _local(child.tag) == "body":
            body = child
            break
    if _local(root.tag) == "body":
        body = root
    if body is None:
        raw = [el.text for el in root.iter()
               if _local(el.tag) == "t" and el.text]
        return False, [], [], raw

    blocks: List[tuple] = []
    tables: List[List[List[str]]] = []
    for child in body:
        tag = _local(child.tag)
        if tag == "p":
            if plain:
                # rich-free document: no numPr/link/emphasis anywhere,
                # so the span collector would emit exactly _para_text
                blocks.append(
                    ("p", _para_style(child, style_map), _para_text(child))
                )
            else:
                numpr = _para_numpr(child)
                text = _para_inline_md(child, rels)
                if numpr is not None:
                    blocks.append(("li", numpr[0], numpr[1], text))
                else:
                    blocks.append(
                        ("p", _para_style(child, style_map), text)
                    )
        elif tag == "tbl":
            rows = []
            for tr in child:
                if _local(tr.tag) != "tr":
                    continue
                cells = []
                for tc in tr:
                    if _local(tc.tag) != "tc":
                        continue
                    # python-docx cell.text: paragraphs joined with '\n'
                    ptexts = [
                        _para_text(p) for p in tc if _local(p.tag) == "p"
                    ]
                    cells.append("\n".join(ptexts))
                rows.append(cells)
            tables.append(rows)
    return True, blocks, tables, []


def convert_docx_xml(stem: str, payload: str,
                     style_map: Optional[dict] = None,
                     rels: Optional[dict] = None,
                     numbering: Optional[dict] = None) -> str:
    """DOCX conversion over the raw OOXML ``word/document.xml`` string.

    Primary path replicates the python-docx walk of the reference
    (docx_converter.py:66-98): title prefix ``# {stem}\\n\\n``
    (:73), body-level paragraphs in order with blank paragraphs
    dropped (:75-77), heading classifier (:79-85), body text as
    ``{text}\\n\\n`` (:87), then ALL tables appended after the
    paragraphs (:89-96) as ``\\n|`` + per-row ``c1|c2|`` + ``\\n``
    trailing — deliberately no GFM header-separator row (byte-equality
    over beauty).

    On top of that fallback surface, the pandoc-class richness of the
    reference's PRIMARY path (docx_converter.py:37-63: pandoc emits
    lists, links, emphasis) is reproduced structurally: w:numPr
    paragraphs become Markdown list items (``numbering`` resolves
    numId/ilvl -> numFmt; bullet when absent), w:hyperlink becomes
    ``[text](target)`` (``rels`` resolves r:id; w:anchor -> #anchor),
    and bold/italic runs become **/*/*** spans — grammar documented at
    _ORDERED_NUMFMTS.  Paragraphs using none of these emit
    byte-identically to the plain walk.

    If the document has no ``w:body`` (bare runs), fall back to the
    reference's raw-XML extraction (docx_converter.py:144-178): every
    ``*}t`` element's text joined with ``\\n``, same title prefix,
    no trailing newline (:174-176).

    """
    has_body, blocks, tables, raw = _et_docx_parse(payload, style_map, rels)
    return _emit_docx(stem, has_body, blocks, tables, raw, numbering)


def docx_rels_map(zf: "zipfile.ZipFile") -> dict:
    """rId -> Target from word/_rels/document.xml.rels — the hyperlink
    resolution pandoc applies for [text](url) emission."""
    mapping: dict = {}
    name = "word/_rels/document.xml.rels"
    if name not in zf.namelist():
        return mapping
    root = ET.fromstring(zf.read(name))
    for rel in root:
        if _local(rel.tag) != "Relationship":
            continue
        rid = rel.attrib.get("Id")
        target = rel.attrib.get("Target")
        if rid and target:
            mapping[rid] = target
    return mapping


def docx_numbering_map(zf: "zipfile.ZipFile") -> dict:
    """{numId: {ilvl: numFmt}} from word/numbering.xml: w:num maps
    numId -> abstractNumId; w:abstractNum carries per-level w:numFmt
    ('bullet', 'decimal', ...) — the two-hop resolution Word (and
    pandoc) applies to decide list markers."""
    name = "word/numbering.xml"
    if name not in zf.namelist():
        return {}
    root = ET.fromstring(zf.read(name))
    abstract: dict = {}
    num_to_abs: dict = {}
    for el in root:
        tag = _local(el.tag)
        if tag == "abstractNum":
            aid = _attr(el, "abstractNumId")
            levels: dict = {}
            for lvl in el:
                if _local(lvl.tag) != "lvl":
                    continue
                ilvl = _attr(lvl, "ilvl")
                fmt = None
                for pr in lvl:
                    if _local(pr.tag) == "numFmt":
                        fmt = _attr(pr, "val")
                        break
                if ilvl is not None and fmt:
                    levels[int(ilvl)] = fmt
            if aid is not None:
                abstract[aid] = levels
        elif tag == "num":
            nid = _attr(el, "numId")
            for ref in el:
                if _local(ref.tag) == "abstractNumId":
                    num_to_abs[nid] = _attr(ref, "val")
                    break
    return {nid: abstract.get(aid, {}) for nid, aid in num_to_abs.items()}


def docx_style_map(zf: "zipfile.ZipFile") -> dict:
    """styleId -> style name from word/styles.xml — the resolution
    python-docx applies before the reference's ``style.name`` check
    (docx_converter.py:79)."""
    mapping: dict = {}
    if "word/styles.xml" not in zf.namelist():
        return mapping
    root = ET.fromstring(zf.read("word/styles.xml"))
    for style in root:
        if _local(style.tag) != "style":
            continue
        sid = next((v for k, v in style.attrib.items()
                    if _local(k) == "styleId"), None)
        name = None
        for el in style:
            if _local(el.tag) == "name":
                name = next((v for k, v in el.attrib.items()
                             if _local(k) == "val"), None)
                break
        if sid and name:
            mapping[sid] = name
    return mapping


def convert_docx_bytes(stem: str, payload: bytes) -> str:
    """Real binary .docx: ZIP -> word/document.xml (+ styles.xml for
    styleId->name, document.xml.rels for hyperlink targets,
    numbering.xml for list formats), then the same DOM walk as the
    string path.  Mirrors the reference's raw-ZIP handling
    (docx_converter.py:150-161) with the python-docx E4/E5 semantics
    plus the pandoc-class list/link/emphasis richness on top."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    if "word/document.xml" not in zf.namelist():
        raise ValueError("not a DOCX: word/document.xml missing")
    styles = docx_style_map(zf)
    return convert_docx_xml(
        stem, zf.read("word/document.xml").decode("utf-8"),
        style_map=styles, rels=docx_rels_map(zf),
        numbering=docx_numbering_map(zf),
    )


def extract_document_bytes(doc_id: str, payload: Optional[bytes],
                           fmt_hint: str = "") -> Tuple[str, str, str]:
    """(md, status, message) for one binary document — the reference's
    actual input shape (files as bytes).  Magic-byte dispatch:
    %PDF- -> PDF, PK\\x03\\x04 -> DOCX-or-XLSX (xlsx handled by the
    dedicated operator; here PK means docx), else decoded text/HTML via
    the string kernels.  Same failure isolation as extract_turn."""
    stem = sanitize_stem(doc_id)
    try:
        if payload is None:
            raise ValueError("不支持的文件类型: empty payload")
        if payload[:5] == b"%PDF-":
            md = convert_pdf(stem, payload.decode("latin-1"))
        elif payload[:4] == b"\xd0\xcf\x11\xe0":
            md = convert_doc(stem, payload)
        elif payload[:4] == b"PK\x03\x04":
            md = convert_docx_bytes(stem, payload)
        else:
            text = payload.decode("utf-8", errors="replace")
            fmt = sniff_format(text, fmt_hint)
            if fmt == FMT_UNKNOWN:
                raise ValueError(f"不支持的文件类型: {fmt_hint or 'unknown'}")
            if fmt == FMT_HTML:
                md = convert_html(stem, text)
            elif fmt == FMT_DOCX:
                md = convert_docx_xml(stem, text)
            elif fmt == FMT_DOC:
                # declared .doc whose bytes failed the OLE2 magic
                # check above: parse (and fail) rather than text-wrap
                md = convert_doc(stem, payload)
            else:
                md = wrap_text_md(stem, text)
        if not verify_markdown(md):
            return md, FAILED, "verify failed: empty or blank output"
        return md, OK, ""
    except Exception as e:  # noqa: BLE001 — failure isolation by design
        msg = str(e)[-MESSAGE_TAIL:]
        return f"# {stem}\n\n转换错误: {msg}\n", FAILED, msg


# --------------------------------------------------------------------------
# M4 — HTML main-content extraction with boilerplate strip
# (north_star addition beyond the reference; semantics pinned by OUR
# golden fixtures, tests/test_kernels.py)
# --------------------------------------------------------------------------
_HTML_SKIP_CONTAINERS = {
    "script", "style", "nav", "header", "footer", "aside", "form",
    "button", "noscript", "svg", "iframe",
}
_HTML_BLOCK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "pre"}


@dataclass
class _Block:
    tag: str
    text: str
    link_chars: int
    total_chars: int
    tag_count: int

    @property
    def link_ratio(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 1.0

    @property
    def tag_density(self) -> float:
        return self.tag_count / max(1, self.total_chars)


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self._skip_depth = 0
        self._stack: List[dict] = []  # open block frames
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _HTML_SKIP_CONTAINERS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _HTML_BLOCK_TAGS:
            self._stack.append(
                {"tag": tag, "parts": [], "link": 0, "tags": 0}
            )
        elif self._stack:
            self._stack[-1]["tags"] += 1

    def handle_endtag(self, tag):
        if tag in _HTML_SKIP_CONTAINERS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _HTML_BLOCK_TAGS and self._stack:
            # close the innermost matching frame
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i]["tag"] == tag:
                    frame = self._stack.pop(i)
                    raw = "".join(frame["parts"])
                    # pre keeps verbatim whitespace; everything else is
                    # whitespace-normalized prose
                    text = raw.strip() if tag == "pre" \
                        else re.sub(r"\s+", " ", raw).strip()
                    self.blocks.append(
                        _Block(tag, text, frame["link"], len(text), frame["tags"])
                    )
                    break

    def handle_data(self, data):
        if self._skip_depth or not self._stack:
            return
        self._stack[-1]["parts"].append(data)
        if self._link_depth:
            self._stack[-1]["link"] += len(data.strip())


# boilerplate thresholds (pinned by fixtures): a block whose visible
# text is majority link text, or absurdly tag-dense, is navigation/chrome
MAX_LINK_RATIO = 0.5
MAX_TAG_DENSITY = 0.25

_TAG_RE = re.compile(
    r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<![^>]*>|<\?[^>]*>"
    r"|</?([a-zA-Z][a-zA-Z0-9]*)[^>]*?>",
    re.DOTALL,
)
_RAW_TEXT_TAGS = {"script", "style"}
_WS_COLLAPSE_RE = re.compile(r"\s+")


def _fast_blocks(payload: str) -> List[_Block]:
    """Regex tag scanner semantically identical to _BlockParser but
    ~5x faster (html.parser is regex-per-char).  Equivalence is
    enforced by the differential test in tests/test_kernels.py.

    Hot-path notes (round-8 micro-opt, ~25% off the per-doc cost):
    frames are 4-slot lists [tag, parts, link_len, tag_count] instead
    of dicts; end/self-close detection reads single characters of the
    payload instead of allocating ``m.group(0)`` per tag; the regex
    search and the lookup sets ride in locals."""
    from html import unescape

    blocks: List[_Block] = []
    skip_depth = 0
    link_depth = 0
    stack: List[list] = []
    pos = 0
    low = None  # lazily lowered copy for raw-text close search
    n = len(payload)
    search = _TAG_RE.search
    raw_text_tags = _RAW_TEXT_TAGS
    skip_containers = _HTML_SKIP_CONTAINERS
    block_tags = _HTML_BLOCK_TAGS
    ws_sub = _WS_COLLAPSE_RE.sub

    def data(chunk: str) -> None:
        if skip_depth or not stack or not chunk:
            return
        if "&" in chunk:
            chunk = unescape(chunk)
        frame = stack[-1]
        frame[1].append(chunk)
        if link_depth:
            frame[2] += len(chunk.strip())

    def close_block(tag: str) -> None:
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == tag:
                frame = stack.pop(i)
                raw = "".join(frame[1])
                text = raw.strip() if tag == "pre" \
                    else ws_sub(" ", raw).strip()
                blocks.append(
                    _Block(tag, text, frame[2], len(text), frame[3])
                )
                break

    while pos < n:
        m = search(payload, pos)
        if not m:
            data(payload[pos:])
            break
        start = m.start()
        if start > pos:
            data(payload[pos:start])
        pos = m.end()
        tag = m.group(1)
        if tag is None:  # comment/doctype/CDATA/PI
            continue
        tag = tag.lower()
        # the token is "<...>" with the name group present, so char
        # checks replace the group(0) slice: "</x...>" / "<x.../>"
        is_end = payload[start + 1] == "/"
        is_selfclose = payload[pos - 2] == "/"

        if not is_end:
            # start tag (and the start half of <x/>)
            if tag in raw_text_tags:
                # raw-text element: jump to its closing tag
                if low is None:
                    low = payload.lower()
                close = low.find(f"</{tag}", pos)
                pos = n if close < 0 else close
                skip_depth += 1  # matching endtag decrements
                if close < 0:
                    skip_depth -= 1
                continue
            if tag in skip_containers:
                skip_depth += 1
            elif not skip_depth:
                if tag == "a":
                    link_depth += 1
                if tag in block_tags:
                    stack.append([tag, [], 0, 0])
                elif stack:
                    stack[-1][3] += 1
        if is_end or is_selfclose:
            if tag in skip_containers:
                skip_depth = max(0, skip_depth - 1)
                continue
            if skip_depth:
                continue
            if tag == "a":
                link_depth = max(0, link_depth - 1)
            if tag in block_tags and stack:
                close_block(tag)
    return blocks


def convert_html(stem: str, payload: str) -> str:
    """Main-content HTML -> Markdown with tag-density + link-text-ratio
    boilerplate stripping (north_star capability; no reference analog —
    the reference never parses HTML).  Emission grammar mirrors §2.4:
    ``# {stem}`` title prefix, ``{'#'*n} text`` headings, paragraphs as
    ``text\\n\\n``, list items as ``- text\\n`` (list closed by a blank
    line), ``pre`` as a ```text fenced block."""
    try:
        blocks = _fast_blocks(payload)
    except Exception:  # noqa: BLE001 — conservative fallback
        parser = _BlockParser()
        parser.feed(payload)
        parser.close()
        blocks = parser.blocks

    out = [f"# {stem}\n\n"]
    in_list = False
    for b in blocks:
        if not b.text:
            continue
        if b.link_ratio > MAX_LINK_RATIO or b.tag_density > MAX_TAG_DENSITY:
            continue  # boilerplate: link-heavy or markup-heavy block
        if b.tag == "li":
            out.append(f"- {b.text}\n")
            in_list = True
            continue
        if in_list:
            out.append("\n")
            in_list = False
        if b.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            out.append(f"{'#' * int(b.tag[1])} {b.text}\n\n")
        elif b.tag == "pre":
            out.append(f"```text\n{b.text}\n```\n\n")
        else:
            out.append(f"{b.text}\n\n")
    if in_list:
        out.append("\n")
    return "".join(out)


# --------------------------------------------------------------------------
# E9/F7 — XLSX workbook -> per-sheet CSV
# --------------------------------------------------------------------------
def stringify_cell(v) -> str:
    """``"" if v is None else str(v)`` — the reference's entire value
    type system (xlsx_to_csv/main.py:94-96)."""
    return "" if v is None else str(v)


def sheet_to_csv_text(rows: List[List]) -> str:
    """CSV emission byte-equal to ``_write_sheet_csv``
    (xlsx_to_csv/main.py:99-104): ``csv.writer`` default dialect over a
    file opened ``newline=""`` -> CRLF row terminators, minimal
    quoting."""
    buf = io.StringIO()
    w = csv.writer(buf)  # default dialect: lineterminator '\r\n'
    for row in rows:
        w.writerow([stringify_cell(v) for v in row])
    return buf.getvalue()


_A1_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ... 'AA'->26 (cell reference column part)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _xlsx_cell_value(c_elem, shared: List[str]):
    """Decode one <c> cell to the Python value openpyxl would yield
    under data_only=True: shared/inline strings -> str, t='b' -> bool,
    numbers -> int when integral-looking else float, formula cells use
    the cached <v>.  (Date styling is NOT applied — dates surface as
    Excel serial numbers; documented gap vs openpyxl.)"""
    t = c_elem.get("t", "n")
    v_text = None
    for child in c_elem:
        tag = _local(child.tag)
        if tag == "v":
            v_text = child.text
        elif tag == "is":  # inline string
            return "".join(
                el.text or "" for el in child.iter() if _local(el.tag) == "t"
            )
    if v_text is None:
        return None
    if t == "s":
        return shared[int(v_text)]
    if t == "b":
        return v_text == "1"
    if t in ("str", "inlineStr"):
        return v_text
    if re.fullmatch(r"-?\d+", v_text):
        return int(v_text)
    try:
        return float(v_text)
    except ValueError:
        return v_text


def parse_xlsx_bytes(payload: bytes) -> List[Tuple[str, List[List]]]:
    """Pure-stdlib XLSX reader: [(sheet_name, rows)] in workbook order.

    XLSX is a ZIP of XML (the same fact the reference's raw-DOCX
    fallback exploits, docx_converter.py:150-161); this replays
    openpyxl's ``load_workbook(data_only=True, read_only=True)`` view
    (xlsx_to_csv/main.py:120) with zipfile + ElementTree: sheet order
    from workbook.xml, rId->target from workbook.xml.rels, shared
    strings resolved, rows padded to the sheet's max column the way
    ``iter_rows(values_only=True)`` pads."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = set(zf.namelist())

    shared: List[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root:
            shared.append(
                "".join(el.text or "" for el in si.iter()
                        if _local(el.tag) == "t")
            )

    rels = {}
    rel_path = "xl/_rels/workbook.xml.rels"
    if rel_path in names:
        for rel in ET.fromstring(zf.read(rel_path)):
            rels[rel.get("Id")] = rel.get("Target", "")

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets: List[Tuple[str, List[List]]] = []
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        name = el.get("name", "")
        rid = next((v for k, v in el.attrib.items() if _local(k) == "id"), "")
        target = rels.get(rid, f"worksheets/sheet{len(sheets) + 1}.xml")
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        if target not in names:
            sheets.append((name, []))
            continue
        ws = ET.fromstring(zf.read(target))
        rows: List[List] = []
        max_col = 0
        for row in ws.iter():
            if _local(row.tag) != "row":
                continue
            cells: dict = {}
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r", "")
                m = _A1_RE.fullmatch(ref) if ref else None
                idx = _col_index(m.group(1)) if m else len(cells)
                cells[idx] = _xlsx_cell_value(c, shared)
            if cells:
                max_col = max(max_col, max(cells) + 1)
            rows.append(cells)
        padded = [
            [r.get(i) for i in range(max_col)] for r in rows
        ]
        sheets.append((name, padded))
    return sheets


def convert_workbook(stem: str, payload: str, sheet: Optional[str] = None):
    """Workbook -> list of (csv_name, csv_text).

    The sandbox has no openpyxl, so the payload is the pinned
    JSON workbook representation
    ``{"sheets": [{"name": .., "rows": [[..]]}]}`` (FIXTURES.md §4);
    with openpyxl installed a binary branch would parse real XLSX via
    ``load_workbook(data_only=True, read_only=True)``
    (xlsx_to_csv/main.py:120).  Naming rule (:139-147): multi-sheet
    -> ``{stem}__{sanitized_sheet}.csv``, single sheet (or --sheet)
    -> ``{stem}.csv``.  Missing --sheet name is an error (:126-132).
    """
    if isinstance(payload, (bytes, bytearray)):
        try:
            import openpyxl  # type: ignore  # real library when present

            wb_real = openpyxl.load_workbook(
                io.BytesIO(bytes(payload)), data_only=True, read_only=True
            )
            pairs = [
                (sn, [list(r) for r in wb_real[sn].iter_rows(values_only=True)])
                for sn in wb_real.sheetnames
            ]
        except ImportError:
            pairs = parse_xlsx_bytes(bytes(payload))
    else:
        wb = json.loads(payload)
        pairs = [(s.get("name", ""), s.get("rows", []))
                 for s in wb.get("sheets", [])]
    names = [n for n, _ in pairs]
    if sheet is not None:
        if sheet not in names:
            raise ValueError(f"sheet not found: {sheet}")
        pairs = [(n, r) for n, r in pairs if n == sheet]
    multiple = len(pairs) > 1 and sheet is None
    out = []
    for name, rows in pairs:
        safe = sanitize_stem(name, default="sheet")
        csv_name = f"{stem}__{safe}.csv" if multiple else f"{stem}.csv"
        out.append((csv_name, sheet_to_csv_text(rows)))
    return out


# --------------------------------------------------------------------------
# S8 — Markdown -> PDF sink
# --------------------------------------------------------------------------
_PDF_ESCAPE = str.maketrans({"\\": r"\\", "(": r"\(", ")": r"\)"})
_PDF_PAGE_LINES = 46          # (720 - 72) / 14pt leading
_PDF_FONT_OBJ = """<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"""
# F2: a non-embedded Type0/Identity-H CID font for lines that latin-1
# cannot carry (CJK — the reference's own corpus language, see
# /root/reference/README.md).  Text is written as UTF-16BE hex strings
# and the Identity ToUnicode CMap below declares code == Unicode, so
# any spec-compliant extractor (including this repo's) recovers the
# exact source text.  Glyph RENDERING of CJK needs a viewer-side font
# (no font program is embedded — executors shouldn't ship one); the
# sink's contract is content preservation, which is what the
# extraction round-trip verifies.
_PDF_CID_FONT_OBJ = (
    "<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light "
    "/Encoding /Identity-H /DescendantFonts [5 0 R] /ToUnicode 6 0 R >>"
)
_PDF_CID_DESCENDANT_OBJ = (
    "<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light "
    "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
    "/Supplement 0 >> /DW 1000 >>"
)
_PDF_TOUNICODE_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0000> <FFFF> <0000>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
# Continuation marker: a content-stream COMMENT (every PDF renderer
# ignores %-comments inside streams) that this repo's extractor reads
# as "this page continues the previous line block", making the
# multi-page round trip newline-exact instead of inserting '\n\n' at
# every 46-line pagination boundary.
_PDF_CONT_MARKER = "%cont"


def markdown_to_pdf_bytes(md: str) -> bytes:
    """Minimal valid PDF-1.4 rendering of a Markdown text: one text
    line per source line, 46 lines/page, US-Letter.

    Repo analog of the reference's md_to_pdf pipeline
    (md_to_pdf/main.py:65-69), which shells out to the external
    `md-to-pdf` tool — an external renderer is the wrong shape for a
    Spark executor, and its styled output is not byte-reproducible, so
    the sink is re-based on a deterministic stdlib writer: same
    capability (every .md becomes a .pdf), deterministic bytes, and
    round-trip verifiable with this repo's own extract_pdf_text
    (tests/test_md_pdf.py).

    Text encoding per line: latin-1-safe lines are Helvetica (F1)
    literal strings; anything else — CJK (the reference's own corpus
    language), emoji, any Unicode — switches to the Identity-H CID
    font (F2) and is written as a UTF-16BE hex string with an Identity
    ToUnicode CMap, so no character ever degrades to '?'.

    Round-trip contract (ALL inputs, any length):
    extract_pdf_text(markdown_to_pdf_bytes(md)) == md, byte-exact.
    Pagination is invisible to the round trip: continuation pages open
    with a %cont stream comment (ignored by renderers) that this
    repo's extractor reads as "join with '\\n', not '\\n\\n'".
    """
    lines = md.split("\n")
    pages = [lines[i:i + _PDF_PAGE_LINES]
             for i in range(0, len(lines), _PDF_PAGE_LINES)] or [[]]

    # object numbering: 1 catalog, 2 pages, 3 F1 font, 4 F2 Type0
    # font, 5 its descendant CIDFont, 6 the ToUnicode CMap stream,
    # then per page i: (7 + 2i) page object, (8 + 2i) content stream
    n_pages = len(pages)
    objs: List[bytes] = []

    kids = " ".join(f"{7 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objs.append(_PDF_FONT_OBJ.encode())
    objs.append(_PDF_CID_FONT_OBJ.encode())
    objs.append(_PDF_CID_DESCENDANT_OBJ.encode())
    objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                % (len(_PDF_TOUNICODE_CMAP), _PDF_TOUNICODE_CMAP))
    for i, page_lines in enumerate(pages):
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> "
             f"/Contents {8 + 2 * i} 0 R >>").encode())
        ops = []
        if i:  # continuation page: newline-exact join on extraction
            ops.append(_PDF_CONT_MARKER)
        ops.append("BT /F1 11 Tf 72 720 Td 14 TL")
        cur_font = "F1"
        for line in page_lines:
            try:
                line.encode("latin-1")
                font = "F1"
            except UnicodeEncodeError:
                font = "F2"
            if font != cur_font:
                ops.append(f"/{font} 11 Tf")
                cur_font = font
            if font == "F1":
                safe = line.translate(_PDF_ESCAPE)
                # a raw 'endstream' inside the text would terminate
                # the non-greedy stream scan early (silently losing
                # the rest of the document); the octal escape \145
                # ('e') is byte-different but decodes identically
                if "endstream" in safe:
                    safe = safe.replace("endstream", r"\145ndstream")
                ops.append(f"({safe}) Tj T*")
            else:
                hx = line.encode("utf-16-be").hex().upper()
                ops.append(f"<{hx}> Tj T*")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream"
                    % (len(stream), stream))

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_at))
    return bytes(out)


# --------------------------------------------------------------------------
# D2 — output verification gate
# --------------------------------------------------------------------------
def verify_markdown(md: Optional[str]) -> bool:
    """The reference's only correctness check, ``_verify_conversion``
    (delete_manager.py:102-130): output exists, size > 0, first 1KB is
    non-blank."""
    if md is None or len(md) == 0:
        return False
    return bool(md[:1024].strip())


# --------------------------------------------------------------------------
# Top-level per-turn dispatch (the engine core, one logical document)
# --------------------------------------------------------------------------
def extract_turn(conv_id: str, turn_idx: int, text: Optional[str],
                 fmt_hint: str = "") -> Tuple[str, str, str]:
    """(md, status, message) for one transcript turn.

    Failure isolation: any kernel exception yields a ``failed`` row
    carrying the error-artifact markdown (mirror of the reference's
    error .md sink, pdf_converter.py:49-57) and a tail-truncated
    message (main.py:375-376) — one bad turn never aborts the job
    (main.py:451-456 semantics).
    """
    stem = turn_stem(conv_id, turn_idx)
    try:
        fmt = sniff_format(text or "", fmt_hint)
        if fmt == FMT_UNKNOWN:
            raise ValueError(f"不支持的文件类型: {fmt_hint or 'unknown'}")
        if fmt == FMT_PDF:
            md = convert_pdf(stem, text or "")
        elif fmt == FMT_DOCX:
            md = convert_docx_xml(stem, text or "")
        elif fmt == FMT_DOC:
            md = convert_doc(stem, (text or "").encode("latin-1", "replace"))
        elif fmt == FMT_HTML:
            md = convert_html(stem, text or "")
        else:
            md = wrap_text_md(stem, text or "")
        if not verify_markdown(md):
            return md, FAILED, "verify failed: empty or blank output"
        return md, OK, ""
    except Exception as e:  # noqa: BLE001 — failure isolation by design
        msg = str(e)[-MESSAGE_TAIL:]
        err_md = f"# {stem}\n\n转换错误: {msg}\n"
        return err_md, FAILED, msg
