"""Vectorized (Catalyst/codegen) format detection.

North-star upgrade of the reference's suffix dispatch
(doc_to_md/main.py:184-192): dispatch on payload magic prefixes,
metadata `fmt` column only as tiebreak.  Kept as Column expressions so
the dispatch participates in pushdown/pruning and costs zero Python.
Must stay semantics-identical to kernels.sniff_format (tested by
hypothesis round-trip in tests/test_extract_spark.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels import (
    FMT_DOC,
    FMT_DOCX,
    FMT_HTML,
    FMT_PDF,
    FMT_TEXT,
    FMT_UNKNOWN,
    KNOWN_FMTS,
    OLE_MAGIC_STR,
)


# str.lstrip()'s whitespace set, spelled out: Java regex \s is
# ASCII-only, so NBSP/U+2028-led payloads would classify differently on
# the Column path vs the kernel twin without the explicit Unicode
# members (every codepoint where str.isspace() is True).  \x{...}
# escapes work in Java regex and RE2 alike, so a SQL oracle can replay
# the same class verbatim.
_WS_CLASS = (
    r"[\s\x{1C}-\x{1F}\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}"
    r"\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)


def sniff_format(text: Column, fmt_hint: Column | None = None) -> Column:
    head = F.substring(text, 1, 512)
    # regexp strip, NOT F.ltrim: ltrim removes only spaces, while the
    # kernel twin uses str.lstrip() (all Unicode whitespace) — \n/\t/
    # NBSP-led payloads must classify identically on both paths
    stripped = F.regexp_replace(head, f"^{_WS_CLASS}+", "")
    low = F.lower(F.substring(stripped, 1, 64))
    hint = fmt_hint if fmt_hint is not None else F.lit("")
    hint = F.coalesce(hint, F.lit(""))

    is_xmlish = stripped.startswith("<?xml") | stripped.startswith("<w:document")
    return (
        F.when(text.isNull(), F.lit(FMT_UNKNOWN))
        .when(head.startswith("%PDF-"), F.lit(FMT_PDF))
        .when(head.startswith(OLE_MAGIC_STR), F.lit(FMT_DOC))
        .when(is_xmlish & head.contains("<w:"), F.lit(FMT_DOCX))
        .when(is_xmlish & low.contains("<html"), F.lit(FMT_HTML))
        .when(is_xmlish, F.lit(FMT_UNKNOWN))
        .when(low.startswith("<!doctype") | low.startswith("<html"), F.lit(FMT_HTML))
        .when(hint.isin(*KNOWN_FMTS), hint)
        .when(hint != "", F.lit(FMT_UNKNOWN))
        .otherwise(F.lit(FMT_TEXT))
    )
