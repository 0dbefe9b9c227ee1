"""Behavioral tests for the round-6 corpus-curation operators:
TF-IDF top-terms, BM25 retrieval, exact-substring duplication stats,
winnowing fingerprints, and corpus-trained bigram-LM perplexity.

Hand-sized inputs with independently computed expectations — the
DuckDB parity harness checks engine equivalence; these pin the
SEMANTICS (would catch an identical bug on both sides).
"""

import math

import pytest
from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators import dedup as D
from tool_documentsconverter_spark.operators import ranking as R
from tool_documentsconverter_spark.operators import textstats as TS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- tfidf


def test_tfidf_prefers_rare_terms(spark):
    # 'rare' appears in 1 of 3 docs; 'common' in all 3.  Equal tf in
    # doc 0 => 'rare' must outrank 'common'.
    df = _docs(spark, [
        (0, "rare common"),
        (1, "common x"),
        (2, "common y"),
    ])
    out = {(r.doc_id, r.rank): (r.term, r.score)
           for r in R.tfidf_topk_terms(df, k=2).collect()}
    assert out[(0, 1)][0] == "rare"
    assert out[(0, 2)][0] == "common"
    # smooth idf: tf * (ln((N+1)/(df+1)) + 1)
    assert out[(0, 1)][1] == pytest.approx(
        round(1 * (math.log(4 / 2) + 1), 6))
    assert out[(0, 2)][1] == pytest.approx(
        round(1 * (math.log(4 / 4) + 1), 6))


def test_tfidf_rank_ties_break_by_term(spark):
    # two terms with identical tf and df in the same doc => identical
    # score; rank must be deterministic by ascending term
    df = _docs(spark, [(0, "bbb aaa"), (1, "zzz")])
    rows = R.tfidf_topk_terms(df, k=2).where(F.col("doc_id") == 0).collect()
    got = [(r.rank, r.term) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == [(1, "aaa"), (2, "bbb")]


# ---------------------------------------------------------------- bm25


def test_bm25_ranks_matching_docs_and_drops_nonmatching(spark):
    df = _docs(spark, [
        (0, "spark table scan"),          # 2 query terms
        (1, "table only here"),           # 1 query term
        (2, "nothing relevant at all"),   # 0 -> excluded (score 0)
        (3, "table table table table"),   # high tf, saturating
    ])
    out = R.bm25_topk(df, ["table", "scan"], topk=10).collect()
    ids = [r.doc_id for r in out]
    assert 2 not in ids
    assert ids[0] == 0  # two distinct terms beat repeated one term
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == \
        list(range(1, len(out) + 1))


def test_bm25_tf_saturation(spark):
    # k1 bounds the tf contribution: 4x the tf must yield far less
    # than 4x the score (saturation), but still strictly more.
    df = _docs(spark, [
        (0, "q a b c"),
        (1, "q q q q"),
        (2, "x x x x"),
    ])
    out = {r.doc_id: r.score for r in R.bm25_topk(df, ["q"], topk=10).collect()}
    assert out[1] > out[0]
    assert out[1] < 4 * out[0]


def test_bm25_hand_computed_score(spark):
    # single doc containing the term once, N=2, df=1, dl=2, avgdl=1.5
    df = _docs(spark, [(0, "q z"), (1, "z")])
    out = {r.doc_id: r.score for r in R.bm25_topk(df, ["q"], topk=5).collect()}
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    tf_term = 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 1.5))
    assert out == {0: pytest.approx(round(idf * tf_term, 6))}


# ------------------------------------------------------ dup_ngram_stats


def test_dup_ngram_stats_flags_shared_spans(spark):
    shared = "one two three four five six"
    df = _docs(spark, [
        (0, shared + " alpha beta gamma delta epsilon"),
        (1, shared + " zeta eta theta iota kappa"),
        (2, "totally different words with no overlap here"),
    ])
    out = {r.doc_id: r for r in D.dup_ngram_stats(df, n=5).collect()}
    # docs 0/1 share exactly the 2 distinct 5-grams inside `shared`
    assert out[0].dup_grams == 2 and out[1].dup_grams == 2
    assert out[2].dup_grams == 0 and out[2].dup_frac == 0.0
    # 11 tokens -> 7 distinct 5-grams per doc
    assert out[0].n_grams == 7
    assert out[0].dup_frac == pytest.approx(round(2 / 7, 6))


def test_dup_ngram_stats_identical_docs_are_fully_duplicated(spark):
    text = "a b c d e f g h"
    df = _docs(spark, [(0, text), (1, text)])
    for r in D.dup_ngram_stats(df, n=5).collect():
        assert r.dup_frac == 1.0


# ------------------------------------------------- winnow_fingerprints


def test_winnow_shared_substring_produces_shared_fingerprint(spark):
    # guarantee: a shared substring of >= k + w - 1 = 6 words yields
    # at least one identical fingerprint in both documents
    shared = "alpha beta gamma delta epsilon zeta"
    df = _docs(spark, [
        (0, "intro words here " + shared + " tail one"),
        (1, shared + " completely other suffix tokens"),
        (2, "unrelated content without any of those"),
    ])
    fps = TS.winnow_fingerprints(df, k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 6-gram must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])


def test_winnow_short_doc_gets_one_fingerprint(spark):
    # fewer than w k-grams -> the single min-hash fingerprint
    df = _docs(spark, [(0, "a b c")])  # exactly one 3-gram
    rows = TS.winnow_fingerprints(df, k=3, w=4).collect()
    assert len(rows) == 1


def test_winnow_density(spark):
    # w-window minima: roughly n/w distinct fingerprints, never more
    # than the number of windows, at least 1 per w-window stretch
    words = " ".join(f"tok{i * 7 % 31}x{i}" for i in range(40))
    df = _docs(spark, [(0, words)])
    n = len(TS.winnow_fingerprints(df, k=3, w=4).collect())
    n_grams = 40 - 3 + 1
    assert 1 <= n <= n_grams - 4 + 1
    assert n >= n_grams // (2 * 4)  # sanity: not degenerate


# ---------------------------------------------------------- lm scoring


def test_lm_perplexity_boilerplate_scores_lower_than_gibberish(spark):
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(10)]
    rows.append((10, "zxqj vvkw pqmz uuro wwne yyil"))
    out = {r.doc_id: r for r in TS.lm_perplexity(_docs(spark, rows)).collect()}
    # repeated boilerplate = high-count bigrams = low nll; the hapax
    # gibberish doc must sit strictly above every boilerplate doc
    assert out[10].avg_nll > out[0].avg_nll
    assert out[10].ppl > out[0].ppl
    assert out[0].n_bigrams == 8


def test_lm_perplexity_hand_computed(spark):
    # corpus: "a b" x2 and "a c".  V = 3.
    # prefix counts c(a .) = 3; c2(a b) = 2, c2(a c) = 1.
    df = _docs(spark, [(0, "a b"), (1, "a b"), (2, "a c")])
    out = {r.doc_id: r for r in TS.lm_perplexity(df).collect()}
    nll_ab = -math.log((2 + 1) / (3 + 3))
    nll_ac = -math.log((1 + 1) / (3 + 3))
    assert out[0].avg_nll == pytest.approx(round(nll_ab, 6))
    assert out[2].avg_nll == pytest.approx(round(nll_ac, 6))
    assert out[2].ppl == pytest.approx(round(math.exp(nll_ac), 4))


def test_lm_perplexity_drops_sub_bigram_docs(spark):
    df = _docs(spark, [(0, "solo"), (1, ""), (2, "two words")])
    assert [r.doc_id for r in TS.lm_perplexity(df).collect()] == [2]
