"""Physical-plan assertions: the optimizations we rely on at 100 TB
must actually appear in the plan, not just in comments.
"""

import pytest

from pyspark.sql import functions as F

from tool_documentsconverter_spark.functions.markdown import wrap_turn_md


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def explain(df) -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(docs):
    q = docs.where(F.col("doc_id") < 100).select("doc_id", "n_chars")
    plan = explain(q)
    # predicate pushed into the scan and schema pruned to 2 columns
    assert "PushedFilters" in plan
    assert "LessThan(doc_id,100)" in plan.replace(" ", "")
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_column_pruning(docs):
    q = docs.select("doc_id")
    plan = explain(q)
    read_schema = plan.split("ReadSchema")[1][:120]
    assert "doc_id" in read_schema and "text" not in read_schema


def test_broadcast_join_for_small_dim(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    q = cust.join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
    assert "BroadcastHashJoin" in explain(q)


def test_antijoin_bucket_skip_is_scan_filter(spark):
    """The resume skip must be a literal isin filter (pushdown-able),
    not a join."""
    from tool_documentsconverter_spark.plans.pipeline import with_bucket
    from tool_documentsconverter_spark.sources.transcripts import synth_transcripts

    df = with_bucket(synth_transcripts(spark, 50), 8)
    skipped = df.where(~F.col("bucket").isin([0, 1]))
    plan = explain(skipped)
    assert "Join" not in plan  # the skip is a filter, never a shuffle


def test_range_join_is_hash_join_never_nested_loop(spark, sf_dir):
    """The bucketed range join must plan as a hash equi-join on
    (key, bucket) — a raw BETWEEN theta-join would fall back to
    BroadcastNestedLoopJoin/CartesianProduct, which is the exact
    failure mode the operator exists to avoid."""
    from tool_documentsconverter_spark.operators.rangejoin import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wins = ev.select(
        F.col("event_id").alias("iv_id"), "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("w_end"),
    )
    pts = ev.select("user_id", F.col("ts").alias("p_ts"),
                    F.col("event_id").alias("p_id"))
    plan = explain(range_join(wins, pts, key="user_id",
                              start_col="w_start", end_col="w_end",
                              ts_col="p_ts", bucket_seconds=300))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # it IS a join — an equi (hash/sort-merge) one


def test_bucketed_tables_join_without_exchange(spark):
    """Pre-bucketed storage is the co-located-join tool for repeated
    big joins on the same key: both sides bucketed by the join key
    into the same bucket count must sort-merge join with ZERO Exchange
    nodes (no shuffle at read OR join time)."""
    from pyspark.sql import functions as F

    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(1000).withColumn("v", F.col("id") % 7)
        for t in ("bj_a", "bj_b"):
            (df.write.bucketBy(8, "id").sortBy("id")
             .mode("overwrite").saveAsTable(t))
        q = spark.table("bj_a").join(spark.table("bj_b"), "id")
        plan = explain(q)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_lsh_guard_is_skew_safe_anti_join(spark, sf_dir):
    """The mega-bucket guard is a combinable bucket-size aggregate +
    anti-join against the over-cap list — NO window over the bucket
    key (the rounds 3-6 window shape serialized a boilerplate
    mega-bucket through one task; see dedup.py minhash_lsh_pairs
    docstring).  The anti-join must not force a broadcast (AQE may
    choose one at runtime when the over-cap list measures small)."""
    from tool_documentsconverter_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = minhash_lsh_pairs(docs, "doc_id", "text")
    q.collect()
    initial = explain(q)
    assert "Window" not in initial
    assert "LeftAnti" in initial


def test_embedding_cosine_guard_is_skew_safe_anti_join(spark, sf_dir):
    """Round-8: embedding_cosine_dups' mega-bucket guard is the same
    combinable aggregate + LeftAnti shape as minhash_lsh_pairs — the
    last Window.partitionBy(bucket-key) straggler flagged by the
    round-7 verdict is gone, so no degenerate signature bucket can
    serialize through one task."""
    from tool_documentsconverter_spark.operators.dedup import (
        embedding_cosine_dups,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = embedding_cosine_dups(docs, "doc_id", "text", dim=16,
                              n_bands=2, bits_per_band=4)
    q.collect()
    initial = explain(q)
    assert "Window" not in initial
    assert "LeftAnti" in initial


def test_markdown_wrap_is_codegen(docs):
    """The pure-column emitter must stay inside WholeStageCodegen —
    no Python/Arrow eval node in the plan."""
    df = docs.select(
        wrap_turn_md(F.col("source"), (F.col("doc_id") % 100).cast("int"),
                     F.col("text")).alias("md")
    )
    plan = explain(df)
    assert "codegen id" in plan  # whole-stage codegen spans the Project
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow"):
        assert bad not in plan


def test_extraction_has_single_python_stage(spark):
    """Exactly one Arrow/Python boundary in the extraction plan —
    the dispatch lives inside the stage, not as one UDF per format."""
    from tool_documentsconverter_spark.operators.extract import extract
    from tool_documentsconverter_spark.sources.transcripts import synth_transcripts

    import re

    out = extract(synth_transcripts(spark, 50), hint_col="fmt_hint")
    plan = explain(out)
    # tree nodes look like "MapInArrow (5)"; synth contributes one,
    # extraction must add exactly one more (dispatch inside the stage,
    # not one UDF per format)
    assert len(re.findall(r"MapInArrow \(\d+\)", plan)) <= 2


def test_mojibake_repair_is_codegen(docs):
    """The replace chain must compile into one codegen'd Project —
    no Python boundary, no shuffle."""
    from tool_documentsconverter_spark.functions.text import fix_mojibake

    plan = explain(docs.select(fix_mojibake(F.col("text")).alias("t")))
    assert "codegen id" in plan
    for bad in ("Exchange", "ArrowEvalPython", "BatchEvalPython",
                "MapInArrow"):
        assert bad not in plan


def test_repetition_signals_is_shuffle_free(docs):
    """Per-document facts never leave the row: the sorted-ngram
    run-length fold is one narrow Project — zero exchanges, no join,
    no window, no Python boundary."""
    from tool_documentsconverter_spark.operators import textstats as TS2

    plan = explain(TS2.repetition_signals(docs))
    for bad in ("Exchange", "SortMergeJoin", "BroadcastNestedLoop",
                "Window", "MapInArrow", "ArrowEvalPython"):
        assert bad not in plan


def test_extract_arrow_path_scans_source_once(spark, sf_dir):
    """The adopted single-stage shape reads the source exactly once;
    the split ('column') shape provably pays a second scan — Catalyst
    pushes each branch's fmt predicate through the repartition into
    the scan (the measured reason it lost the 5M-turn A/B,
    BENCH/BASELINE.md round 5).  Pinned so a future refactor that
    accidentally double-scans the default path fails loudly."""
    import re as _re

    from tool_documentsconverter_spark.operators.extract import extract

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        (F.col("doc_id") % 100).cast("int").alias("turn_idx"),
        "text",
    ).repartition(8, "conv_id")

    def n_scans(df):
        # formatted explain shows each node in the tree AND a detail
        # section; "(N) Scan parquet" headers count each node once
        return len(_re.findall(r"\(\d+\) Scan parquet", explain(df)))

    assert n_scans(extract(turns, text_path="arrow")) == 1
    assert n_scans(extract(turns, text_path="column")) == 2


def test_ivf_quantized_adds_no_scans_or_shuffles(spark, sf_dir):
    """int8 quantization must be a FREE plan transformation: the
    quantize -> dequantize chain is codegen'd higher-order expressions
    inside the corpus scan stage, so ivf_quantized_topk's physical
    plan has exactly the same parquet-scan count and exchange count
    as the float ivf_topk plan (same centroids, same probes).  Pinned
    so a refactor that materializes codes through a shuffle or a
    second scan fails loudly."""
    import re as _re

    from tool_documentsconverter_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = SIM.fit_ivf_centroids(emb, n_cells=8)
    queries = emb.where(F.col("vec_id") < 3)

    def counts(df):
        plan = explain(df)
        return (len(_re.findall(r"\(\d+\) Scan parquet", plan)),
                len(_re.findall(r"\(\d+\) Exchange", plan)))

    f = counts(SIM.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=4,
                            centroids=cents))
    q = counts(SIM.ivf_quantized_topk(emb, queries, k=5, n_cells=8,
                                      n_probe=4, centroids=cents))
    assert q == f, (q, f)


def test_winnow_fingerprints_is_shuffle_free(docs):
    """Winnowing is a per-row array fold: grams, hashes, window minima
    and the distinct-fold never leave the row, so the plan has ZERO
    exchanges — the narrow-plan discipline that makes it run at scan
    speed on 10^12 rows."""
    from tool_documentsconverter_spark.operators import textstats as TS

    plan = explain(TS.winnow_fingerprints(docs))
    assert "Exchange" not in plan


def test_corpus_stat_operators_skew_safe_shapes(docs):
    """dup_ngram_stats / lm_perplexity / tfidf_topk_terms attach
    corpus counts skew-safely: the count table is a map-side
    combinable aggregate rejoined to the rows (a shuffle join AQE's
    skew handling can split — the round-6 window-over-occurrence-rows
    shape put every occurrence of a hot key into ONE unbounded window
    frame and cannot be split).  NO window function may partition by
    an occurrence-level key; dup_ngram_stats' corpus exchanges must
    carry the 8-byte xxhash64 key, not raw gram text."""
    import re

    from tool_documentsconverter_spark.operators import dedup as D
    from tool_documentsconverter_spark.operators import ranking as RK
    from tool_documentsconverter_spark.operators import textstats as TS

    plan = explain(D.dup_ngram_stats(docs))
    assert "Window" not in plan
    keys = re.findall(r"hashpartitioning\(([^,)]+)", plan)
    # round-8 shape: gram-level exchanges carry the 8-byte xxhash64
    # key (_hk); the only other keys are document-level (doc_id or
    # the _owner doc id of a count-1 gram) — never raw gram text
    corpus_keys = {k for k in keys if not k.startswith("doc_id")}
    assert corpus_keys and all(
        k.startswith("_hk") or k.startswith("_owner") for k in corpus_keys)

    plan = explain(TS.lm_perplexity(docs))
    # the only Window runs over the AGGREGATED model table (its sum
    # argument is the post-aggregation _c2 column), never over raw
    # bigram occurrences
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_c2" in line

    plan = explain(RK.tfidf_topk_terms(docs))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # round-8: df(term) attaches via a combinable aggregate + join,
    # never a Window over the term partition (a corpus-wide term would
    # own one unsplittable window task); the only window left is the
    # per-document top-k rank
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            part_key = line.split("windowspecdefinition(")[1].split(",")[0]
            assert not part_key.startswith("term")


def test_bm25_is_two_scans_and_a_topk(docs):
    """bm25_topk's plan shape: per-doc tfs as codegen expressions on
    the scan (no explode/Generate), corpus stats broadcast back, and
    the final top-k as TakeOrderedAndProject — never a global
    rangepartitioning sort and never a corpus-side hash shuffle."""
    from tool_documentsconverter_spark.operators import ranking as RK

    plan = explain(RK.bm25_topk(docs, ["scan", "table"], topk=10))
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no token explode
    assert "rangepartitioning" not in plan
    assert "Exchange hashpartitioning" not in plan
