"""The extraction stage: one `mapInArrow` pass over payload batches.

Design (SURVEY.md §2.3, §3.4): a SINGLE vectorized stage with the
per-format dispatch inside — no branch-and-union (that would scan the
input once per format), no per-row Python UDF calls from the JVM (the
Python boundary is crossed once per Arrow batch; batch size bounded by
spark.sql.execution.arrow.maxRecordsPerBatch).  The dominant payload
class (plain text) is handled with vectorized pandas string ops inside
the batch; structured formats (OOXML/PDF/HTML) run the stdlib kernels
per element — cheap relative to the Arrow transfer they amortize.

Failure isolation (reference doc_to_md/main.py:451-456): kernel errors
become `status='failed'` rows with tail-truncated messages; the job
never aborts on a bad payload.
"""

from __future__ import annotations

import time
from typing import Iterator, List

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels
from ..functions.sniff import sniff_format

RESULT_COLS = ["md", "status", "message", "seconds"]


def with_sniffed_format(df: DataFrame, hint_col: str | None = None) -> DataFrame:
    """Add the `fmt` column via codegen'd Column expressions so the
    dispatch is decided JVM-side (and filterable with pushdown) before
    any Python runs."""
    hint = F.col(hint_col) if hint_col and hint_col in df.columns else None
    return df.withColumn("fmt", sniff_format(F.col("text"), hint))


def _make_extractor(out_cols: List[str], hint_col: str | None = None):
    def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pandas as pd  # executor-side import

        for batch in batches:
            t0 = time.perf_counter()
            pdf = batch.to_pandas()
            n = len(pdf)
            if n == 0:
                continue
            text = pdf["text"].astype(object).where(pdf["text"].notna(), None)
            if "fmt" in pdf.columns:
                fmt = pdf["fmt"].astype(object)
            else:
                fmt = pd.Series(
                    [kernels.sniff_format(t if t is not None else "") for t in text],
                    index=pdf.index, dtype=object,
                )
                pdf["fmt"] = fmt

            # fast path: plain text rows, fully vectorized pandas string ops
            is_text = fmt == kernels.FMT_TEXT
            stems = (
                pdf["conv_id"].astype(str)
                + "_"
                + pdf["turn_idx"].astype(int).map("{:05d}".format)
            ).map(kernels.sanitize_stem)
            md = pd.Series([None] * n, index=pdf.index, dtype=object)
            status = pd.Series([kernels.OK] * n, index=pdf.index, dtype=object)
            message = pd.Series([""] * n, index=pdf.index, dtype=object)

            txt_filled = text.where(text.notna(), "")
            md[is_text] = (
                "# " + stems[is_text] + "\n\n```text\n"
                + txt_filled[is_text].astype(str) + "\n```\n"
            )
            # D2 verify gate (delete_manager.py:102-130) on the fast path
            blank = is_text & ~md.map(
                lambda m: kernels.verify_markdown(m) if m is not None else False
            )
            status[blank] = kernels.FAILED
            message[blank] = "verify failed: empty or blank output"

            # structured formats: per-element stdlib kernels; the
            # ORIGINAL metadata hint (not the sniffed fmt) feeds the
            # kernel so failure messages match the oracle byte-for-byte
            hints = (
                pdf[hint_col].astype(object)
                if hint_col and hint_col in pdf.columns
                else fmt
            )
            for i in pdf.index[~is_text]:
                m, s, msg = kernels.extract_turn(
                    pdf.at[i, "conv_id"],
                    int(pdf.at[i, "turn_idx"]),
                    text.at[i],
                    fmt_hint=str(hints.at[i] or ""),
                )
                md.at[i], status.at[i], message.at[i] = m, s, msg

            per_row = (time.perf_counter() - t0) / n
            out = pdf.assign(
                md=md, status=status, message=message, seconds=float(per_row)
            )[out_cols]
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return _extract_batches


def extract(df: DataFrame, hint_col: str | None = None) -> DataFrame:
    """Append (fmt, md, status, message, seconds) extraction columns.

    Input must carry conv_id:string, turn_idx:int, text:string; all
    other columns pass through untouched.
    """
    if "fmt" not in df.columns:
        df = with_sniffed_format(df, hint_col)
    out_cols = [f.name for f in df.schema.fields] + RESULT_COLS
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["md string", "status string", "message string", "seconds double"]
    )
    return df.mapInArrow(_make_extractor(out_cols, hint_col), out_schema)
