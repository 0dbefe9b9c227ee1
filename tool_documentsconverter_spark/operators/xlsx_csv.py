"""XLSX workbook -> per-sheet CSV as a Spark operator (E9/F7/F8,
xlsx_to_csv/main.py:94-159).

One input row (a workbook payload) fans out to N output rows (one per
sheet) — the reference's per-sheet file fan-out re-expressed as an
`explode` over an ArrayType result (SURVEY.md §2.11: the engine's only
UDTF-like shape).  The CSV text is assembled by the shared kernel so
bytes match the reference (CRLF, minimal quoting, None -> "").

Payloads here are the pinned JSON workbook representation (no openpyxl
in the sandbox — kernels.convert_workbook documents the binary branch
for real deployments).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.fanout import fan_out

from .. import kernels


def _convert_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        names = batch.schema.names
        stems = batch.column(names.index("stem")).to_pylist()
        payloads = batch.column(names.index("payload")).to_pylist()
        out_stem, out_name, out_text, out_status, out_msg = [], [], [], [], []
        for stem, payload in zip(stems, payloads):
            try:
                sheets = kernels.convert_workbook(
                    kernels.sanitize_stem(stem), payload
                )
                for csv_name, csv_text in sheets:
                    out_stem.append(stem)
                    out_name.append(csv_name)
                    out_text.append(csv_text)
                    out_status.append(kernels.OK)
                    out_msg.append("")
            except Exception as e:  # failure isolation (main.py:451-456)
                out_stem.append(stem)
                out_name.append(None)
                out_text.append(None)
                out_status.append(kernels.FAILED)
                out_msg.append(str(e)[-kernels.MESSAGE_TAIL:])
        yield pa.RecordBatch.from_pydict({
            "stem": pa.array(out_stem, type=pa.string()),
            "csv_name": pa.array(out_name, type=pa.string()),
            "csv_text": pa.array(out_text, type=pa.string()),
            "status": pa.array(out_status, type=pa.string()),
            "message": pa.array(out_msg, type=pa.string()),
        })


def workbooks_to_csv(df: DataFrame, stem_col: str = "stem",
                     payload_col: str = "payload") -> DataFrame:
    """(stem, payload) -> one row per produced CSV:
    (stem, csv_name, csv_text, status, message)."""
    src = fan_out(df.select(F.col(stem_col).alias("stem"),
                            F.col(payload_col).alias("payload")))
    return src.mapInArrow(
        _convert_batches,
        "stem string, csv_name string, csv_text string, "
        "status string, message string",
    )
