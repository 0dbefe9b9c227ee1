"""Byte-pair-encoding token counting — the tokenizer-aware budget the
whitespace-token operators (`chunk_documents`, `pack_sequences`) need:
training budgets are BPE tokens, and whitespace counts are 2-4x off on
code/CJK-adjacent text.

The encoder is a FIXED-VOCAB greedy BPE, expressed entirely as codegen
column algebra — no Python in the hot path and no UDF at all:

* a document is rendered as a marked string: every ``[a-z0-9]`` char
  wrapped in single spaces (so adjacent tokens are separated by a
  DOUBLE space) and every non-alphanumeric run collapsed to ``#`` (so
  merges can never cross a word boundary);
* each merge ``(x, y)`` is ONE literal string replace
  ``" x  y " -> " xy "``.  Applying merges in rank order as
  sequential global leftmost-first replaces is EXACTLY the classic
  fast-BPE encoding: a merge's inputs can only be produced by
  earlier-ranked merges (the standard training invariant, which
  ``DEFAULT_MERGES`` and `learn_bpe_merges` both uphold), so one
  global pass per merge suffices, and leftmost-first within a rank is
  the usual tie-break.  Literal ``replace`` has identical semantics
  in Spark and DuckDB, which is what makes the oracle replayable from
  the same merge-table literal;
* the token count is then just the number of ``[a-z0-9]+`` runs in
  the merged string (tokens are always separated by spaces or ``#``).

Scale shape: counting is a pure per-row projection — zero shuffle,
whole-stage codegen, ~len(merges) string scans per row.  Training
(`learn_bpe_merges`) is the only iterative part: one map-side
combinable pair-count aggregate per merge round, argmax on the driver
(one tiny scalar per round, like `pagerank_fixed`'s dangling sum) —
run it on a `hash_sample` of the corpus, then count with the learned
literal everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hand-laid mini English merge table (48 merges).  Rank order is the
# training order; every multi-char part is produced by an earlier
# merge (the invariant the sequential-replace encoder relies on).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("t", "i"), ("ti", "on"), ("in", "g"),
    ("o", "u"), ("i", "s"), ("i", "t"), ("a", "r"), ("s", "t"),
    ("t", "o"), ("o", "f"), ("e", "d"), ("a", "l"), ("i", "c"),
    ("a", "s"), ("l", "e"), ("s", "e"), ("c", "h"), ("o", "m"),
    ("c", "e"), ("l", "l"), ("u", "s"), ("m", "a"), ("u", "r"),
    ("w", "h"), ("wh", "ic"), ("whic", "h"), ("f", "or"), ("n", "o"),
    ("w", "it"), ("wit", "h"), ("d", "e"), ("p", "o"), ("b", "e"),
    ("h", "a"), ("t", "er"), ("en", "t"),
)


def _validate(merges) -> None:
    formed = set()
    for x, y in merges:
        for part in (x, y):
            if len(part) > 1 and part not in formed:
                raise ValueError(
                    f"merge part {part!r} is not a single char and not "
                    "produced by an earlier merge — sequential replace "
                    "would not reproduce BPE")
        formed.add(x + y)


def _wrap(col) -> Column:
    """Marked form: lowercase, non-alnum runs -> '#', every alnum char
    wrapped in single spaces.  'the cat' -> ' t  h  e # c  a  t '."""
    t = F.lower(F.coalesce(col, F.lit("")))
    t = F.regexp_replace(t, "[^a-z0-9]+", "#")
    return F.regexp_replace(t, "([a-z0-9])", " $1 ")


def bpe_segmented(col, merges=DEFAULT_MERGES) -> Column:
    """The marked string after all merges — tokens are the [a-z0-9]+
    runs, in order.  Internal building block, exposed for tests."""
    _validate(merges)
    out = _wrap(col)
    for x, y in merges:
        out = F.replace(out, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
    return out


def bpe_token_count(col, merges=DEFAULT_MERGES) -> Column:
    """Number of BPE tokens in a text column — pure codegen."""
    return F.size(
        F.regexp_extract_all(bpe_segmented(col, merges),
                             F.lit("[a-z0-9]+"), F.lit(0))
    ).cast("long")


def bpe_tokens(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               merges=DEFAULT_MERGES) -> DataFrame:
    """Per-document tokenizer-aware budget numbers: (id, n_words,
    n_bpe_tokens, bpe_per_word).  Zero shuffle — one codegen
    projection over the scan."""
    words = F.size(F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z0-9]+"), F.lit(0))).cast("long")
    n_bpe = bpe_token_count(F.col(text_col), merges)
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe / F.nullif(words, F.lit(0)), 6).alias("bpe_per_word"),
    )


def bpe_encode(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               merges=DEFAULT_MERGES) -> DataFrame:
    """(id, pos, token) — the actual token stream, for goldens and
    vocabulary audits.  Same codegen segmentation + one posexplode."""
    toks = F.regexp_extract_all(
        bpe_segmented(F.col(text_col), merges), F.lit("[a-z0-9]+"),
        F.lit(0))
    return df.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "token"))


def learn_bpe_merges(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     n_merges: int = 16,
                     min_count: int = 2) -> list[tuple[str, str]]:
    """Distributed BPE TRAINING: `n_merges` rounds of (count adjacent
    token pairs corpus-wide, take the most frequent, apply it).  Ties
    break by pair text ascending, so the learned table is
    deterministic across partitionings and cluster sizes.

    Each round is one map-side-combinable groupBy over exploded
    pairs + a driver-side argmax (a single tiny row, the
    `pagerank_fixed` pattern); the working corpus is localCheckpoint'd
    per round so lineage stays flat.  Cost is n_merges corpus scans —
    train on a `hash_sample`, not the full 100 TB.
    """
    cur = df.select(_wrap(F.col(text_col)).alias("s")).localCheckpoint(
        eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # token array MATERIALIZED in its own projection before the
        # pair transform — element_at inside the lambda must reference
        # the column, not re-run the regex per element (HOF lambdas
        # hoist nothing; see shingles())
        wordtoks = (
            cur.select(F.explode(F.split(F.col("s"), "#")).alias("w"))
            .select(F.regexp_extract_all(
                F.col("w"), F.lit("[a-z0-9]+"), F.lit(0)).alias("_t"))
        )
        t = F.col("_t")
        pair_arr = F.filter(
            F.transform(
                t,
                lambda tok, i: F.struct(
                    tok.alias("x"),
                    F.try_element_at(t, i + 2).alias("y")),
            ),
            lambda p: p["y"].isNotNull(),
        )
        top = (
            wordtoks.select(F.explode(pair_arr).alias("p"))
            .groupBy("p").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.col("p.x"), F.col("p.y"))
            .limit(1)
            .collect()
        )
        if not top or top[0].c < min_count:
            break
        x, y = top[0].p.x, top[0].p.y
        merges.append((x, y))
        cur = cur.select(
            F.replace(F.col("s"), F.lit(f" {x}  {y} "),
                      F.lit(f" {x}{y} ")).alias("s")
        ).localCheckpoint(eager=True)
    return merges
