"""Scalar string surface as pure Column expressions (SURVEY.md §2.10).

Everything here compiles into WholeStageCodegen — no Python boundary.
Each function cites the reference behavior it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# char blacklist of safe_stem (doc_to_md/main.py:244-249) /
# _sanitize_filename (xlsx_to_csv/main.py:64-67) as a regex class
SANITIZE_RE = r'[/\\:*?"<>|]'


def sanitize_stem(col: Column, default: str = "document") -> Column:
    """Column twin of kernels.sanitize_stem: blacklist -> '_', strip,
    default when empty.  Whitespace strip via regexp (NOT F.trim —
    SQL trim strips spaces only, Python .strip() strips all
    whitespace; the kernel and this twin must agree byte-for-byte)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(col, SANITIZE_RE, "_"), r"^\s+|\s+$", ""
    )
    return F.when(cleaned == "", F.lit(default)).otherwise(cleaned)


def turn_stem(conv_id: Column, turn_idx: Column) -> Column:
    """Column twin of kernels.turn_stem: `{conv_id}_{turn_idx:05d}`
    sanitized (FIXTURES.md §1 title-key convention)."""
    raw = F.concat(conv_id, F.lit("_"), F.lpad(turn_idx.cast("string"), 5, "0"))
    return sanitize_stem(raw)


def message_tail(col: Column, n: int = 1200) -> Column:
    """Tail-truncation of failure messages to the last n chars
    (doc_to_md/main.py:375-376 keeps stderr[-1200:], stdout[-600:])."""
    return F.right(col, F.lit(n))
