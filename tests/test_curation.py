"""Corpus-curation composites added in round 6: corpus-level line
dedup (CCNet/RefinedWeb boilerplate removal), the C4 cleaning rule
set, and end-to-end fuzzy-dedup keeper selection."""

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators import dedup as D
from tool_documentsconverter_spark.operators import textstats as TS


def _rows(df, key="doc_id"):
    return {r[key]: r for r in df.collect()}


# ------------------------------------------------------------ line_dedup
def test_line_dedup_drops_shared_lines_keeps_order(spark):
    df = spark.createDataFrame(
        [
            (1, "unique one\nShared Footer\nunique two"),
            (2, "shared footer\nonly here"),
            (3, "  SHARED FOOTER \nanother unique"),
        ],
        "doc_id long, text string",
    )
    out = _rows(D.line_dedup(df))
    # the footer normalizes identically in all three docs -> dropped
    # everywhere; survivors keep their original order and casing
    assert out[1].clean_text == "unique one\nunique two"
    assert out[2].clean_text == "only here"
    assert out[3].clean_text == "another unique"
    assert out[1].n_lines == 3 and out[1].n_dropped == 1
    assert out[2].n_lines == 2 and out[2].n_dropped == 1
    assert abs(out[2].dropped_frac - 0.5) < 1e-9


def test_line_dedup_blank_lines_and_within_doc_repeats_survive(spark):
    df = spark.createDataFrame(
        [
            # blank lines appear "in" both docs but are never dropped;
            # 'twice' repeats WITHIN doc 1 only (one distinct doc) so
            # the cross-document rule does not fire
            (1, "twice\n\ntwice"),
            (2, "other\n"),
        ],
        "doc_id long, text string",
    )
    out = _rows(D.line_dedup(df))
    assert out[1].clean_text == "twice\n\ntwice"
    assert out[1].n_dropped == 0
    assert out[2].clean_text == "other\n"


def test_line_dedup_min_docs_threshold(spark):
    df = spark.createDataFrame(
        [(i, "common line\nmine %d" % i) for i in range(3)],
        "doc_id long, text string",
    )
    strict = _rows(D.line_dedup(df, min_docs=4))
    assert all(r.n_dropped == 0 for r in strict.values())
    loose = _rows(D.line_dedup(df, min_docs=3))
    assert all(r.clean_text == "mine %d" % i for i, r in loose.items())


def test_line_dedup_all_dropped_doc_yields_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same\nextra")],
        "doc_id long, text string",
    )
    out = _rows(D.line_dedup(df))
    assert out[1].clean_text == "" and out[1].n_dropped == 1
    assert out[3].clean_text == "extra"


# ------------------------------------------------------------ c4 filters
def test_c4_filters_line_rules_and_page_flags(spark):
    good = (
        "This first sentence has six words.\n"
        "tiny line.\n"
        "No terminal punctuation on this line\n"
        "Please enable javascript to continue here.\n"
        "Another proper sentence with many more words!"
    )
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "One good sentence right here today.\nvar x = { a: 1 };"),
            (3, "lorem ipsum dolor sit amet filler.\n"
                "Real sentence number one stands here.\n"
                "Real sentence number two stands here.\n"
                "Real sentence number three stands here."),
        ],
        "doc_id long, text string",
    )
    out = _rows(TS.c4_quality_filters(df))
    r1 = out[1]
    # kept: line 1 (terminal '.', 6 words) and line 5 ('!', 7 words);
    # dropped: 2 words / no punctuation / javascript mention
    assert r1.clean_text == (
        "This first sentence has six words.\n"
        "Another proper sentence with many more words!"
    )
    assert r1.n_lines == 5 and r1.n_kept_lines == 2
    assert r1.n_sentences == 2
    assert not r1.has_lorem and not r1.has_brace
    assert not r1.keep  # only 2 sentences < 3
    r2 = out[2]
    assert r2.has_brace and not r2.keep
    r3 = out[3]
    # the lorem line itself passes the LINE rules but flags the PAGE
    assert r3.n_kept_lines == 4 and r3.n_sentences == 4
    assert r3.has_lorem and not r3.keep


def test_c4_filters_keep_true_on_clean_page(spark):
    clean = "\n".join(
        "Sentence number %d has exactly six words." % i for i in range(4)
    )
    df = spark.createDataFrame([(1, clean)], "doc_id long, text string")
    r = TS.c4_quality_filters(df).collect()[0]
    assert r.keep and r.n_sentences == 4 and r.n_kept_lines == 4


def test_c4_filters_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a.\nb.")], "doc_id long, text string")
    plan = TS.c4_quality_filters(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------- dedup_survivors
def test_fuzzy_dedup_keeper_selection(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(0, text), (1, text), (2, "totally different words entirely "
                                   "unrelated content here now then")],
        "doc_id long, text string",
    )
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text", n_bands=4)
    out = _rows(D.dedup_survivors(df, D.cluster_duplicates(pairs)))
    assert out[0].kept and out[0].cluster_id == 0 and out[0].cluster_size == 2
    assert not out[1].kept and out[1].cluster_id == 0
    assert out[2].kept and out[2].cluster_id == 2 and out[2].cluster_size == 1


def test_line_dedup_skew_safe_shape(spark):
    """Corpus-wide exchanges carry the md5 line hash (never raw line
    text), the distinct-doc count is a combinable aggregate rejoined
    via an AQE-skew-splittable shuffle join, and NO window function
    appears (the round-6 max(dense_rank)-over-window shape put every
    occurrence of a boilerplate line into one single-task frame)."""
    import re

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "b\nc")], "doc_id long, text string"
    )
    plan = D.line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    keys = re.findall(r"hashpartitioning\(([^,)]+)", plan)
    corpus_keys = {k for k in keys if not k.startswith("doc_id")}
    assert corpus_keys
    assert all(k.startswith("_h") or k.startswith("doc_id")
               for k in keys)


def test_dedup_survivors_no_forced_broadcast(spark):
    """A clusters side too large to broadcast must plan as a shuffle
    join — round 6 force-broadcast it, which OOMs at a realistic
    20-40%% duplicate rate (ADVICE r6).  AQE may still CHOOSE a
    broadcast at runtime when the table measures small; the contract
    is only that the operator never forces one."""
    big = 3_000_000
    clusters = (
        spark.range(big)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 1000).alias("cluster_id"),
            F.lit(2).cast("long").alias("cluster_size"),
        )
    )
    corpus = spark.range(big).select(F.col("id").alias("doc_id"))
    plan = (D.dedup_survivors(corpus, clusters)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan


# -------------------------------------------------- bloom_contamination
def test_bloom_flags_superset_of_exact_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta shared tail words"),
            (2, "completely different text with no benchmark overlap"),
            (3, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    exact = {r.doc_id: r.overlap_shingles
             for r in D.contamination_check(corpus, bench,
                                            "doc_id", "text").collect()}
    bloom = {r.doc_id: r.flagged_shingles
             for r in D.bloom_contamination(corpus, bench,
                                            "doc_id", "text").collect()}
    # every truly-contaminated doc is flagged with at least the exact
    # count (bloom has no false NEGATIVES)
    for doc, n in exact.items():
        assert bloom.get(doc, 0) >= n
    assert 1 in bloom and 3 in bloom


def test_bloom_tiny_filter_yields_false_positives(spark):
    corpus = spark.createDataFrame(
        [(1, "nothing here matches the benchmark at all today")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join("w%d" % i for i in range(40)))],
        "doc_id long, text string",
    )
    # 8 bits, 38 bench shingles x 2 hashes -> filter saturates -> every
    # corpus shingle false-positives (the bloom contract, replayed by
    # the oracle's all-bits-present join)
    out = D.bloom_contamination(corpus, bench, "doc_id", "text",
                                m_bits=8, n_hashes=2).collect()
    assert out and out[0].flagged_shingles == 6  # all 6 shingles of doc 1


def test_bloom_probe_is_join_free_single_shuffle(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(2, "a b c")], "doc_id long, text string")
    out = D.bloom_contamination(corpus, bench, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan
    assert plan.count("Exchange hashpartitioning") == 1
