"""Binary-document extraction stage: the reference's actual input
shape (PDF/DOCX files as bytes) over a table of
(doc_id:string, payload:binary, fmt_hint:string?).

Same single-mapInArrow design as operators/extract.py; dispatch is on
magic bytes (%PDF-, PK zip) inside the batch, per-document failure
isolation, message tails — see kernels.extract_document_bytes for the
cited semantics.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        names = batch.schema.names
        ids = batch.column(names.index("doc_id")).to_pylist()
        payloads = batch.column(names.index("payload")).to_pylist()
        hints = (
            batch.column(names.index("fmt_hint")).to_pylist()
            if "fmt_hint" in names else [""] * len(ids)
        )
        md, status, message = [], [], []
        for i, payload in enumerate(payloads):
            m, s, msg = kernels.extract_document_bytes(
                str(ids[i]), payload, fmt_hint=str(hints[i] or "")
            )
            md.append(m); status.append(s); message.append(msg)
        yield pa.RecordBatch.from_pydict({
            "doc_id": pa.array([str(x) for x in ids], type=pa.string()),
            "md": pa.array(md, type=pa.string()),
            "status": pa.array(status, type=pa.string()),
            "message": pa.array(message, type=pa.string()),
        })


def extract_documents(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      hint_col: str | None = None) -> DataFrame:
    cols = [F.col(id_col).cast("string").alias("doc_id"),
            F.col(payload_col).alias("payload")]
    if hint_col and hint_col in df.columns:
        cols.append(F.col(hint_col).alias("fmt_hint"))
    return df.select(*cols).mapInArrow(
        _extract_batches,
        "doc_id string, md string, status string, message string",
    )
