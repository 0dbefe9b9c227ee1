"""Batch curation job for scaling evidence (VERDICT r6 item 1): the
corpus-level SHUFFLE operators — the first operators in this repo
whose exchanges carry corpus-wide data (lines, grams, signatures) —
run end-to-end over a synthetic multi-line documents corpus:

  line_dedup        — line explode, combinable countDistinct, skew-
                      splittable rejoin, per-doc rebuild;
  dup_ngram_stats   — gram explode (md5 keys), combinable count,
                      rejoin, per-doc rollup;
  fuzzy_dedup_keep  — minhash signatures -> banded LSH pairs ->
                      iterative connected components -> survivors
                      rejoin (the full fuzzy-dedup pipeline);
  tfidf_terms       — per-(doc, term) rollup + df attach + top-k.

Each operator's full output is materialized through Spark's `noop`
datasource (every column computed, nothing hits disk — the honest way
to time a shuffle plan without conflating it with sink bandwidth; the
extraction job measures the write path separately).  Prints one JSON
line per --repeat with per-op and total elapsed plus docs_per_sec;
scripts/scaling_evidence.py --job curation drives it at two
parallelism levels for the N -> 4N efficiency number.

The synthetic corpus (``write_curation_corpus``) is deterministic
pure-column construction: ~8 lines/doc with corpus-wide boilerplate
header+footer lines (the line_dedup hot keys), a small word pool so
grams genuinely collide across documents, and 30% of documents exact
duplicates in clusters of <= 3 (the LSH/CC load).  No external data.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def write_curation_corpus(spark, path: str, n_docs: int,
                          partitions: int = 32) -> None:
    """Deterministic (doc_id, text) corpus sized for shuffle-operator
    scaling runs — see module docstring for the shape rationale."""
    from pyspark.sql import functions as F

    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # 30% of docs share their content seed with up to 2 neighbours
    seed = F.when(F.col("doc_id") % 10 < 3,
                  F.col("doc_id") - (F.col("doc_id") % 10)
                  ).otherwise(F.col("doc_id"))

    def word(k: int):
        # small pool (1009 words) so n-grams collide across documents,
        # md5-mixed per (seed, k) so whole-document collisions DON'T
        # happen between different seeds: a first cut used
        # (seed*(7+k)+k*k) % 1009, which depends only on seed mod 1009
        # — every ~1009th document was then an EXACT duplicate, giving
        # 100s-member LSH buckets under the cap and a quadratic pair
        # stage (the operators' contract routes such exact-dup classes
        # through exact_dedup_keys first; the corpus must not smuggle
        # them into the fuzzy path)
        h = F.md5(F.concat(seed.cast("string"), F.lit(f"|{k}")))
        return F.concat(
            F.lit("w"),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1009)
            .cast("string"))

    def line(j: int):
        return F.concat_ws(" ", *[word(5 * j + k) for k in range(5)])

    text = F.concat_ws(
        "\n",
        F.lit("shared cookie banner please accept all cookies now"),
        line(1), line(2), line(3), line(4), line(5), line(6),
        F.lit("copyright footer all rights reserved contact us"),
    )
    (ids.select("doc_id", text.alias("text"))
     .repartition(partitions)
     .write.mode("overwrite").parquet(path))


def _noop(df) -> int:
    """Materialize EVERY column of df (noop sink: no disk, no pruning
    of computed columns) and return 0 (row count is not the metric)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_ops(spark, docs, ops: list[str],
            stage_dir: str | None = None) -> dict:
    """Run the curation PIPELINE in production order: line_dedup
    writes the boilerplate-cleaned corpus to ``stage_dir`` (sink cost
    inside its timing, like the extraction job measures its write) and
    fuzzy dedup consumes the CLEANED corpus — the order every
    production pipeline uses, and for a measurable reason: boilerplate
    lines put the same min-shingle in every document, so LSH over raw
    text funnels a corpus-scale share of signatures into a handful of
    buckets that exist only to be dropped by the cap.  dup_ngram_stats
    and tfidf_terms run over the raw corpus (duplicated boilerplate is
    part of the signal they exist to report)."""
    from ..operators.dedup import (
        cluster_duplicates,
        dedup_survivors,
        dup_ngram_stats,
        line_dedup,
        minhash_lsh_pairs,
    )
    from ..operators.ranking import tfidf_topk_terms
    from pyspark.sql import functions as F

    timings: dict[str, float] = {}
    t_total = time.time()
    for op in ops:
        t0 = time.time()
        if op == "line_dedup":
            cleaned = line_dedup(docs).select(
                "doc_id", F.col("clean_text").alias("text"))
            if stage_dir:
                cleaned.write.mode("overwrite").parquet(stage_dir)
            else:
                _noop(cleaned)
        elif op == "fuzzy_dedup_keep":
            src = (spark.read.parquet(stage_dir)
                   if stage_dir else docs)
            pairs = minhash_lsh_pairs(src, "doc_id", "text", n_bands=4)
            _noop(dedup_survivors(src, cluster_duplicates(pairs)))
        elif op == "dup_ngram_stats":
            _noop(dup_ngram_stats(docs))
        elif op == "tfidf_terms":
            _noop(tfidf_topk_terms(docs))
        else:
            raise SystemExit(f"unknown op {op!r}")
        timings[op] = round(time.time() - t0, 2)
    timings["total"] = round(time.time() - t_total, 2)
    return timings


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--master", default=None)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--ops", default="line_dedup,dup_ngram_stats,"
                                    "fuzzy_dedup_keep,tfidf_terms")
    args = p.parse_args(argv)

    from ..session import get_spark

    spark = get_spark(app="curation-job", master=args.master,
                      shuffle_partitions=args.partitions)
    docs = spark.read.parquet(args.input).select("doc_id", "text")
    n_docs = docs.count()
    ops = [o for o in args.ops.split(",") if o]
    # ADVICE r7: only stage the cleaned corpus when line_dedup
    # actually runs BEFORE fuzzy_dedup_keep — an ops list ordering
    # fuzzy first would otherwise read a missing/stale *_cleaned
    # parquet
    stage_dir = None
    if ("line_dedup" in ops and ("fuzzy_dedup_keep" not in ops
                                 or ops.index("line_dedup")
                                 < ops.index("fuzzy_dedup_keep"))):
        stage_dir = args.input.rstrip("/") + "_cleaned"
    for _ in range(args.repeat):
        timings = run_ops(spark, docs, ops, stage_dir=stage_dir)
        summary = {
            "docs": n_docs,
            "ops": timings,
            "elapsed_sec": timings["total"],
            # max(): the rounded total can be 0.0 on tiny inputs
            "docs_per_sec": round(n_docs / max(timings["total"], 0.01), 1),
        }
        print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
