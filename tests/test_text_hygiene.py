"""Corpus hygiene operators: normalization, PII scrub, Gopher-style
repetition/quality flags — all codegen'd Column expressions."""

from pyspark.sql import functions as F

from tool_documentsconverter_spark.functions.text import (
    normalize_text,
    scrub_pii,
)
from tool_documentsconverter_spark.operators import textstats as TS


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_normalize_text(spark):
    messy = "a​b\x01c d  e\t\tf  \n g  "
    assert _one(spark, messy, normalize_text(F.col("text"))) == \
        "abc d e f\n g"
    assert _one(spark, None, normalize_text(F.col("text"))) == ""


def test_scrub_pii(spark):
    s = ("mail bob.smith+x@corp.example.org or https://ex.com/p?q=1#f "
         "call +1 (555) 123-4567 now")
    out = _one(spark, s, scrub_pii(F.col("text")))
    assert "<EMAIL>" in out and "<URL>" in out and "<PHONE>" in out
    assert "bob" not in out and "ex.com" not in out and "555" not in out


def test_gopher_signals(spark):
    spam = "\n".join(["buy now buy now"] * 10)
    assert _one(spark, spam, TS.frac_duplicate_lines(F.col("text"))) == 0.9
    bullets = "- a\n- b\nplain"
    assert abs(_one(spark, bullets, TS.frac_bullet_lines(F.col("text")))
               - 2 / 3) < 1e-9
    digits = "123 456 word"
    assert abs(_one(spark, digits, TS.frac_alpha_words(F.col("text")))
               - 1 / 3) < 1e-9
    symbols = "# one ... two words here"
    assert _one(spark, symbols, TS.symbol_word_ratio(F.col("text"))) > 0


def test_gopher_keep_verdicts(spark):
    good = ("This is a perfectly ordinary paragraph of english prose "
            "that keeps going with plain sentences and normal words "
            "until it comfortably clears the minimum word threshold "
            "for the quality gate to accept it as real content today. "
            "More filler words arrive to stay safely above the limit.")
    spam = "\n".join(["lorem ipsum repeated line"] * 40)
    df = spark.createDataFrame([(0, good), (1, spam)], "i long, text string")
    got = {r.i: r.keep for r in df.select(
        "i", TS.gopher_flags(F.col("text"), min_words=20).alias("keep")
    ).collect()}
    assert got[0] is True
    assert got[1] is False  # duplicate-line fraction kills it


def test_fix_mojibake(spark):
    from tool_documentsconverter_spark.functions.text import fix_mojibake

    damaged = "it\u00e2\u20ac\u2122s \u00e2\u20ac\u0153fine\u00e2\u20ac\u009d \u00e2\u20ac\u201d caf\u00c3\u00a9 na\u00c3\u00afve?  25\u00c2\u00b0 \u00c2\u00abhi\u00c2\u00bb"
    out = _one(spark, damaged, fix_mojibake(F.col("text")))
    # every table sequence repaired; \u00c3\u00af (damaged 'ï') is NOT
    # in the table and passes through — coverage is explicit, not magic
    assert out == "it\u2019s \u201cfine\u201d \u2014 caf\u00e9 na\u00c3\u00afve?  25\u00b0 \u00abhi\u00bb"
    # clean text (incl. real accents/CJK) passes through untouched
    clean = "it\u2019s fine \u2014 caf\u00e9 \u4e2d\u6587 \u00abok\u00bb 25\u00b0"
    assert _one(spark, clean, fix_mojibake(F.col("text"))) == clean
    assert _one(spark, None, fix_mojibake(F.col("text"))) == ""


def test_fix_mojibake_matches_cp1252_roundtrip(spark):
    # every table entry IS the WHATWG windows-1252 mis-decode of its
    # target's UTF-8 bytes (WHATWG, which browsers and most real-world
    # decoders follow, maps the bytes cp1252 leaves undefined — e.g.
    # 0x9D — to the corresponding C1 controls; Python's strict cp1252
    # raises there instead) — regenerate and compare
    from tool_documentsconverter_spark.functions.text import MOJIBAKE_FIXES

    def whatwg_cp1252(raw: bytes) -> str:
        out = []
        for byte in raw:
            try:
                out.append(bytes([byte]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(byte))
        return "".join(out)

    for bad, good in MOJIBAKE_FIXES:
        assert bad == whatwg_cp1252(good.encode("utf-8")), (bad, good)


def test_repetition_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),    # heavy repetition
            (2, "the quick brown fox jumps over dogs"),  # all unique
            (3, ""),                                     # empty
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TS.repetition_signals(df).collect()}
    # doc 1: bigram 'buy now' occurs 4x ('now buy' 3x); len 7 * 4 = 28
    # chars of 31 total
    assert abs(rows[1].top_ngram_frac - round(28 / 31, 6)) < 1e-9
    assert rows[1].dup_ngram_frac > 0.5   # trigrams repeat heavily
    # doc 2: every bigram unique -> top covers exactly one bigram
    assert rows[2].dup_ngram_frac == 0.0
    assert 0 < rows[2].top_ngram_frac < 0.5
    assert rows[3].top_ngram_frac == 0.0 and rows[3].dup_ngram_frac == 0.0


def test_cjk_aware_token_count(spark):
    # a Chinese sentence is ONE whitespace token but N real tokens
    s = "你好世界"
    assert _one(spark, s, TS.ws_token_count(F.col("text"))) == 1
    assert _one(spark, s, TS.cjk_char_count(F.col("text"))) == 4
    assert _one(spark, s, TS.cjk_aware_token_count(F.col("text"))) == 4
    # mixed script: CJK chars + latin words
    mixed = "hello 世界 world"
    assert _one(spark, mixed, TS.cjk_aware_token_count(F.col("text"))) == 4
    # kana and hangul count too; pure latin falls back to ws behavior
    assert _one(spark, "カナ 한글", TS.cjk_aware_token_count(F.col("text"))) == 4
    assert _one(spark, "plain words here",
                TS.cjk_aware_token_count(F.col("text"))) == 3
    assert _one(spark, None, TS.cjk_aware_token_count(F.col("text"))) == 0
