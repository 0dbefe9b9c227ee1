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


def _make_extractor(out_cols: List[str], hint_col: str | None = None,
                    drop_cols: tuple = ()):
    """Arrow-native batch extractor.  Deliberately NO pandas round
    trip: original columns pass through as untouched Arrow arrays
    (zero copy), only the needed columns materialize to Python lists
    once, and result columns are built as plain lists -> pa.array.
    This is ~2x the throughput of a to_pandas/from_pandas wrapper at
    the same semantics."""

    def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        extract_turn = kernels.extract_turn
        sanitize = kernels.sanitize_stem
        sniff = kernels.sniff_format
        FMT_TEXT = kernels.FMT_TEXT
        OK = kernels.OK

        for batch in batches:
            t0 = time.perf_counter()
            n = batch.num_rows
            if n == 0:
                continue
            names = batch.schema.names
            conv_ids = batch.column(names.index("conv_id")).to_pylist()
            turn_idxs = batch.column(names.index("turn_idx")).to_pylist()
            texts = batch.column(names.index("text")).to_pylist()
            if "fmt" in names:
                fmts = batch.column(names.index("fmt")).to_pylist()
            else:
                fmts = [sniff(t if t is not None else "") for t in texts]
            hints = (
                batch.column(names.index(hint_col)).to_pylist()
                if hint_col and hint_col in names
                else fmts
            )

            md: List[str] = [None] * n  # type: ignore[list-item]
            status: List[str] = [OK] * n
            message: List[str] = [""] * n
            for i in range(n):
                if fmts[i] == FMT_TEXT:
                    # E8 fast path inline (pdf_converter.py:30-35
                    # template); the frame's '# {stem}' makes the D2
                    # blankness gate structurally satisfied
                    t = texts[i]
                    md[i] = (
                        f"# {sanitize(f'{conv_ids[i]}_{turn_idxs[i]:05d}')}"
                        f"\n\n```text\n{t if t is not None else ''}\n```\n"
                    )
                else:
                    m, s, msg = extract_turn(
                        conv_ids[i], turn_idxs[i], texts[i],
                        fmt_hint=str(hints[i] or ""),
                    )
                    md[i], status[i], message[i] = m, s, msg

            per_row = (time.perf_counter() - t0) / n
            # columns dropped HERE never cross Python -> JVM: Catalyst
            # cannot prune through the opaque Arrow stage, so a .drop()
            # after it would still pay the reverse transfer of the
            # largest column (the raw payload)
            arrays = [a for a, f in zip(batch.columns, batch.schema)
                      if f.name not in drop_cols]
            fields = [f for f in batch.schema if f.name not in drop_cols]
            if "fmt" not in names:
                arrays.append(pa.array(fmts, type=pa.string()))
                fields.append(pa.field("fmt", pa.string()))
            arrays += [
                pa.array(md, type=pa.string()),
                pa.array(status, type=pa.string()),
                pa.array(message, type=pa.string()),
                pa.array([per_row] * n, type=pa.float64()),
            ]
            fields += [
                pa.field("md", pa.string()),
                pa.field("status", pa.string()),
                pa.field("message", pa.string()),
                pa.field("seconds", pa.float64()),
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))

    return _extract_batches


def extract(df: DataFrame, hint_col: str | None = None,
            drop_cols: tuple = ()) -> DataFrame:
    """Append (fmt, md, status, message, seconds) extraction columns.

    Input must carry conv_id:string, turn_idx:int, text:string; all
    other columns pass through untouched, EXCEPT those named in
    `drop_cols`, which are dropped inside the Arrow stage so they never
    pay the Python -> JVM return transfer (use for the raw payload when
    the output only needs md).
    """
    if "fmt" not in df.columns:
        df = with_sniffed_format(df, hint_col)
    drop = tuple(c for c in drop_cols if c in df.columns and c != "fmt")
    kept = [f for f in df.schema.fields if f.name not in drop]
    out_cols = [f.name for f in kept] + RESULT_COLS
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in kept]
        + ["md string", "status string", "message string", "seconds double"]
    )
    return df.mapInArrow(_make_extractor(out_cols, hint_col, drop),
                         out_schema)
