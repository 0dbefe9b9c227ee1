"""S8 Markdown -> PDF sink as a vectorized stage.

The reference's md_to_pdf pipeline walks a directory of .md files and
shells out to the external `md-to-pdf` renderer per file
(md_to_pdf/main.py:65-69, concurrency via ThreadPoolExecutor
:100-118).  Table-world analog: one mapInArrow pass over (stem, md)
rows producing (stem, pdf:binary, pdf_bytes, n_pages, status) — the
same failure-isolation contract as the extraction stage (a bad row
yields status='failed', never a dead job).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.fanout import fan_out

from ..kernels import _PDF_PAGE_LINES, markdown_to_pdf_bytes


def _render_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        names = batch.schema.names
        stems = batch.column(names.index("stem")).to_pylist()
        mds = batch.column(names.index("md")).to_pylist()
        pdfs, sizes, n_pages, status = [], [], [], []
        for md in mds:
            try:
                if md is None:
                    raise ValueError("empty markdown")
                pdf = markdown_to_pdf_bytes(md)
                pdfs.append(pdf)
                sizes.append(len(pdf))
                n_pages.append(
                    (md.count("\n") // _PDF_PAGE_LINES) + 1)
                status.append("ok")
            except Exception:  # noqa: BLE001 — failure isolation
                pdfs.append(None)
                sizes.append(0)
                n_pages.append(0)
                status.append("failed")
        yield pa.RecordBatch.from_pydict({
            "stem": pa.array(stems, type=pa.string()),
            "pdf": pa.array(pdfs, type=pa.binary()),
            "pdf_bytes": pa.array(sizes, type=pa.int64()),
            "n_pages": pa.array(n_pages, type=pa.int32()),
            "status": pa.array(status, type=pa.string()),
        })


def render_markdown_pdf(df: DataFrame, stem_col: str = "stem",
                        md_col: str = "md") -> DataFrame:
    """(stem, md) -> (stem, pdf, pdf_bytes, n_pages, status)."""
    src = fan_out(
        df.select(F.col(stem_col).alias("stem"), F.col(md_col).alias("md")))
    return src.mapInArrow(
        _render_batches,
        "stem string, pdf binary, pdf_bytes long, n_pages int, status string",
    )
