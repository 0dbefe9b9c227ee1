"""Round-8 measurement harness (guide §1.4) — NOT the driver bench.

`bench.py` is frozen for measurement; everything exploratory lives
here:

  noop     — time declared queries with the noop sink (computes every
             column, no sink cost) instead of bench.py's .count()
  kernels  — single-core cProfile of the per-row kernels behind
             docx_rich / md_pdf_roundtrip (the numbers quoted in
             OPTIMIZATION_r08.md: ~471us and ~167us per doc)
  shingles — the round-8 shingle A/B (array_join(slice) vs
             concat_ws(get)), with a byte-equality check

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py noop q1 q2 ...
  python bench_extra.py kernels
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py shingles
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(app):
    from tool_documentsconverter_spark.session import get_spark

    spark = get_spark(app=app, master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timeit(name, mk, n=3):
    _noop(mk())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _noop(mk())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best:7.3f}s", flush=True)


def cmd_noop(names):
    import __spark_entry__ as E

    spark = _spark("bench-extra-noop")
    qs = E.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"noop: {name}")
        _timeit(name, lambda n=name: qs[n](spark, SF_DIR))
    spark.stop()


def cmd_kernels():
    import cProfile
    import pstats

    from tool_documentsconverter_spark import kernels as K
    from tool_documentsconverter_spark.sources.transcripts import (
        make_rich_docx_bytes,
    )

    n = 2000
    t0 = time.perf_counter()
    for i in range(n):
        K.convert_docx_bytes(f"rd{i}", make_rich_docx_bytes(i))
    dt = time.perf_counter() - t0
    print(f"docx build+convert: {dt / n * 1e6:.0f} us/doc")

    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF_DIR}/documents.parquet").column(
        "text").to_pylist()[:n]
    t0 = time.perf_counter()
    for t in texts:
        md = K.wrap_text_md("d", t or "")
        pdf = K.markdown_to_pdf_bytes(md)
        back = K.extract_pdf_text(pdf.decode("latin-1"), force_stdlib=True)
        assert back == md
    dt = time.perf_counter() - t0
    print(f"md->pdf->text roundtrip: {dt / len(texts) * 1e6:.0f} us/doc")

    prof = cProfile.Profile()
    prof.enable()
    for i in range(500):
        K.convert_docx_bytes(f"rd{i}", make_rich_docx_bytes(i))
    prof.disable()
    pstats.Stats(prof).sort_stats("cumulative").print_stats(12)


def cmd_shingles():
    from pyspark.sql import functions as F

    from tool_documentsconverter_spark.operators.textstats import (
        TOKEN_SPLIT_RE,
    )
    from tool_documentsconverter_spark.plans.fanout import fan_out

    spark = _spark("bench-extra-shingles")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = 5

    def norm(c):
        return F.lower(F.trim(F.coalesce(c, F.lit(""))))

    def base():
        return fan_out(docs).select(
            F.col("doc_id"),
            F.split(norm(F.col("text")), TOKEN_SPLIT_RE).alias("_t"))

    def old_shape():
        step = base()
        toks = F.col("_t")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
        sh = F.array_distinct(F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")))
        return step.select("doc_id", F.explode(sh).alias("shingle"))

    def new_shape():
        step = base()
        toks = F.col("_t")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
        sh = F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(
                " ", *[F.get(toks, i + j) for j in range(k)])))
        return step.select("doc_id", F.explode(sh).alias("shingle"))

    _timeit("shingles array_join(slice)", old_shape)
    _timeit("shingles concat_ws(get)", new_shape)
    a = old_shape().orderBy("doc_id", "shingle").collect()
    b = new_shape().orderBy("doc_id", "shingle").collect()
    print("byte-equal:", a == b, f"({len(a)} grams)")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "noop"
    if cmd == "noop":
        cmd_noop(sys.argv[2:])
    elif cmd == "kernels":
        cmd_kernels()
    elif cmd == "shingles":
        cmd_shingles()
    else:
        raise SystemExit(f"unknown command {cmd!r}")
