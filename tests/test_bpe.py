"""Fixed-vocab BPE: encoder equivalence to priority-queue BPE,
distributed training vs a pure-Python replica, and the BPE-budget
modes of pack_sequences / chunk_documents."""

import re
from collections import Counter

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators import bpe as B
from tool_documentsconverter_spark.operators import textprep as TP


# ---------------------------------------------------------------- replicas
def _py_bpe_word(word, merges):
    """Classic priority-queue BPE encoding (always merge the
    lowest-rank pair present, leftmost first)."""
    toks = list(word)
    ranks = {m: i for i, m in enumerate(merges)}
    while True:
        best = besti = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, besti = r, i
        if best is None:
            return toks
        toks[besti:besti + 2] = [toks[besti] + toks[besti + 1]]


def _py_encode(text, merges):
    out = []
    for w in re.findall(r"[a-z0-9]+", (text or "").lower()):
        out += _py_bpe_word(w, merges)
    return out


def _py_learn(texts, n, min_count=2):
    docs = [[list(w) for w in re.findall(r"[a-z0-9]+", t.lower())]
            for t in texts]
    merges = []
    for _ in range(n):
        c = Counter()
        for d in docs:
            for w in d:
                for i in range(len(w) - 1):
                    c[(w[i], w[i + 1])] += 1
        if not c:
            break
        (x, y), cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if cnt < min_count:
            break
        merges.append((x, y))
        for d in docs:
            for w in d:
                i = 0
                while i < len(w) - 1:
                    if w[i] == x and w[i + 1] == y:
                        w[i:i + 2] = [x + y]
                    else:
                        i += 1
    return merges


TEXTS = [
    "The theater, the THEATER!",
    "which position with ending 42",
    "standing at the station, ordering tion-heavy words: "
    "nation creation estimation",
    "",
    "zzz qqq xyxyxy",
    "for whom the bell tolls; it tolls for thee",
    "CJK-adjacent 1234567890 mixed a1b2c3",
]


# ---------------------------------------------------------------- encoder
def test_encoder_equals_priority_queue_bpe(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string")
    got = {}
    for r in B.bpe_encode(df).orderBy("doc_id", "pos").collect():
        got.setdefault(r.doc_id, []).append(r.token)
    for i, t in enumerate(TEXTS):
        assert got.get(i, []) == _py_encode(t, list(B.DEFAULT_MERGES)), t


def test_bpe_tokens_counts_and_ratio(spark):
    df = spark.createDataFrame(
        [(1, "the theater"), (2, None), (3, "...!!!")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in B.bpe_tokens(df).collect()}
    # 'the' -> [the]; 'theater' -> [the, at, er]
    assert out[1].n_words == 2 and out[1].n_bpe_tokens == 4
    assert out[1].bpe_per_word == 2.0
    assert out[2].n_words == 0 and out[2].n_bpe_tokens == 0
    assert out[2].bpe_per_word is None
    assert out[3].n_bpe_tokens == 0


def test_invalid_merge_table_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="earlier merge"):
        B.bpe_segmented(F.lit("x"), merges=(("te", "r"),))


def test_default_merges_satisfy_training_invariant():
    B._validate(B.DEFAULT_MERGES)  # must not raise


# ---------------------------------------------------------------- training
def test_learn_bpe_merges_matches_python_replica(spark):
    texts = ["the cat and the hat in the hall",
             "the cattle rattle in that hall",
             "hat cat that chat"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = B.learn_bpe_merges(df, n_merges=6)
    assert got == _py_learn(texts, 6)
    # the learned table is itself a valid sequential-replace vocab
    B._validate(got)
    enc = {}
    for r in B.bpe_encode(df, merges=got).orderBy("doc_id", "pos").collect():
        enc.setdefault(r.doc_id, []).append(r.token)
    for i, t in enumerate(texts):
        assert enc[i] == _py_encode(t, got)


def test_learn_stops_below_min_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once — min_count=2 learns nothing
    assert B.learn_bpe_merges(df, n_merges=4) == []


# ------------------------------------------------------------- integration
def test_pack_sequences_bpe_budget(spark):
    rows = [(i, "s", "the theater on the station") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # per doc: the=1, theater=3 (the/at/er), on=1, the=1,
    # station=4 (st/at/i/on) -> 10 bpe tokens
    out = {r.doc_id: r for r in TP.pack_sequences(
        df, budget_tokens=20, tokenizer="bpe").collect()}
    assert all(r.n_tokens == 10 for r in out.values())
    assert [out[i].bin for i in range(6)] == [0, 0, 1, 1, 2, 2]
    assert out[3].tok_offset == 30
    # whitespace mode differs (5 words per doc)
    ws = {r.doc_id: r for r in TP.pack_sequences(
        df, budget_tokens=20).collect()}
    assert all(r.n_tokens == 5 for r in ws.values())


def test_chunk_documents_bpe_membership_replica(spark):
    text = ("the station theater and the hall with standing nation "
            "creation for which position") * 2
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    chunk, stride = 10, 6
    out = {}
    for r in (TP.chunk_documents(df, chunk_tokens=chunk, stride=stride,
                                 tokenizer="bpe")
              .orderBy("chunk_idx").collect()):
        out[r.chunk_idx] = (r.chunk_text, r.n_tokens)
    # python replica of the belongs-where-it-starts rule
    words = re.findall(r"\S+", text)
    costs = [len(_py_encode(w, list(B.DEFAULT_MERGES))) for w in words]
    starts, b = [], 0
    for c in costs:
        starts.append(b)
        b += c
    exp = {}
    for w, c, s in zip(words, costs, starts):
        kmin = max(0, (s - chunk) // stride + 1)
        kmax = s // stride
        for k in range(kmin, kmax + 1):
            t, n = exp.get(k, ("", 0))
            exp[k] = (t + (" " if t else "") + w, n + c)
    assert out == exp
    # every word appears in at least one chunk, budgets are soft-capped
    assert set(out) == set(range(max(out) + 1))
    assert all(n <= chunk + max(costs) - 1 for _, n in out.values())


def test_chunk_documents_rejects_unknown_tokenizer(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown tokenizer"):
        TP.chunk_documents(df, tokenizer="bytes")
    with pytest.raises(ValueError, match="unknown tokenizer"):
        TP.pack_sequences(df, part_col="doc_id", tokenizer="bytes")
