"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extract_turns_per_sec": ...}

The extraction headline synthesizes sf-proportional transcript turns
(1M * sf) covering every payload case incl. skew, runs the full
salted-repartition + Arrow-extraction pipeline, and reports turns/sec
(the BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as E
    from tool_documentsconverter_spark.operators.extract import extract
    from tool_documentsconverter_spark.plans import pipeline as P
    from tool_documentsconverter_spark.session import get_spark
    from tool_documentsconverter_spark.sources.transcripts import synth_transcripts

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else 0.1
    n_turns = max(1000, int(1_000_000 * sf))

    spark = get_spark(app="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: full extraction pipeline over synthetic transcripts
    transcripts = synth_transcripts(spark, n_turns, partitions=CPUS * 2)
    transcripts.cache().count()  # materialize input outside the timing

    # warm the Python workers (spawn + imports) outside the timings —
    # a long-running cluster pays this once per executor lifetime
    extract(synth_transcripts(spark, 2000, partitions=CPUS),
            hint_col="fmt_hint").count()

    def run_extract(df):
        heavy = P.heavy_conv_ids(df)
        staged = P.partition_for_extraction(df, heavy,
                                            num_partitions=CPUS * 2)
        return extract(staged, hint_col="fmt_hint").count()

    repeats: dict[str, int] = {}

    def timed_best(name, fn, n_runs):
        """min-of-n timing (uniform methodology note in
        BENCH/BASELINE.md round-5 section): every query records its
        repeat count in the JSON so cross-round deltas can be read
        against like-for-like methodology."""
        out = None
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        repeats[name] = n_runs
        return out

    extracted_rows = timed_best("extract_pipeline",
                                lambda: run_extract(transcripts), 2)
    extract_tps = round(extracted_rows / timings["extract_pipeline"], 1)

    realistic = synth_transcripts(spark, n_turns, partitions=CPUS * 2,
                                  mix="realistic")
    realistic.cache().count()
    real_rows = timed_best("extract_realistic",
                           lambda: run_extract(realistic), 2)
    real_tps = round(real_rows / timings["extract_realistic"], 1)
    realistic.unpersist()

    # operator benchmarks from the query inventory
    qs = E.queries()
    for name in [
        "transcript_flagship", "text_wrap_md", "tpch_q1", "revenue_topk",
        "broadcast_dim_join", "events_json", "asof_join", "range_join",
        "events_rollup", "dedup_exact",
        "minhash_lsh_pairs", "simhash", "embedding_cosine_dups",
        "contamination_check",
        "dup_clusters", "textstats", "lang_id",
        "gopher_quality", "repetition_signals",
        "text_normalize_scrub", "mojibake_repair",
        "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk",
        "corpus_curation", "text_chunks", "seq_packing",
        "xlsx_sheet_csv",
        "md_pdf_roundtrip", "docx_rich", "pdf_layout", "cjk_textstats",
        "media_resize", "frame_sample", "media_headers",
        "media_audio", "domain_stats", "embedding_quantize",
        "ann_ivf_quantized",
        "dup_ngram_stats", "winnow_fingerprints", "lm_perplexity",
        "tfidf_terms", "bm25_topk",
        "line_dedup", "c4_filters", "fuzzy_dedup_keep", "warc_extract",
        "bloom_contamination", "mixture_resample", "url_dedup", "pagerank",
        "pagerank_dangling", "bpe_tokens", "seq_packing_bpe",
    ]:
        fn = qs[name]
        timed(name, lambda f=fn: f(spark, SF_DIR).count())
        # Uniform repeat methodology (round 5): sub-second queries sit
        # at the host-noise floor (identical runs vary up to ~2x at
        # 0.3s absolute) and get min-of-5; queries >= 1s get min-of-3.
        # Every entry's repeat count lands in the JSON "repeats" map.
        extra = 4 if timings[name] < 1.0 else 2
        repeats[name] = extra + 1
        best = timings[name]
        for _ in range(extra):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    transcripts.unpersist()
    total = round(sum(timings.values()), 3)
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extract_turns": extracted_rows,
        "extract_turns_per_sec": extract_tps,
        "extract_realistic_turns_per_sec": real_tps,
        "cpus": CPUS,
    }
    detail = dict(summary)
    detail["repeats"] = repeats
    detail["methodology"] = ("min-of-N per query; N in repeats "
                             "(2x extraction, 3x >=1s, 5x sub-second)")
    # Full detail goes to a file + an EARLIER stdout line; the FINAL
    # stdout line must stay well under the driver's 2000-char tail
    # capture (BENCH_r05.json came back parsed:null because the
    # repeats map + methodology pushed the single line past it).
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/bench_local_latest.json", "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    final = json.dumps(summary)
    if len(final) > 1900:  # belt-and-braces: drop per-query detail
        slim = dict(summary)
        slim.pop("queries")
        slim["queries_file"] = "BENCH/bench_local_latest.json"
        final = json.dumps(slim)
    print(final)
    spark.stop()


if __name__ == "__main__":
    main()
