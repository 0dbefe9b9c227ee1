"""Training-prep operators (operators/textprep.py): sliding-window
chunking, deterministic sampling, fixed-budget sequence packing."""

import pytest

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators.textprep import (
    chunk_documents,
    hash_sample,
    pack_sequences,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "w0 " * 99 + "w0"),            # 100 tokens
        (2, "short doc here"),              # 3 tokens -> one chunk
        (3, ""),                            # empty -> one chunk of ['']
        (4, " ".join(f"t{i}" for i in range(50))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_every_token_with_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 4: 50 tokens -> ceil((50-32)/24)+1 = 2 chunks
    c4 = sorted(by_doc[4], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c4] == [0, 1]
    assert c4[0].chunk_text.split(" ") == [f"t{i}" for i in range(32)]
    # second chunk starts at stride 24: tokens 24..49 (26 of them)
    assert c4[1].chunk_text.split(" ") == [f"t{i}" for i in range(24, 50)]
    assert c4[1].n_tokens == 26
    # overlap: tokens 24..31 appear in both windows
    assert set(c4[0].chunk_text.split()) & set(c4[1].chunk_text.split())
    # short and empty docs -> exactly one chunk, idx 0
    assert [r.chunk_idx for r in by_doc[2]] == [0]
    assert by_doc[2][0].n_tokens == 3
    assert [r.chunk_idx for r in by_doc[3]] == [0]


def test_chunking_is_shuffle_free(docs):
    plan = chunk_documents(docs, 32, 24)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # filter + explode only: no shuffle


def test_chunk_validation():
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(None, chunk_tokens=0)
    with pytest.raises(ValueError, match="skip tokens"):
        chunk_documents(None, chunk_tokens=16, stride=24)


def test_hash_sample_is_deterministic_and_salted(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, 0.3).collect()}
    b = {r.doc_id for r in hash_sample(df, 0.3).collect()}
    assert a == b  # pure function of the id, not of partitioning/run
    assert 0.2 < len(a) / 2000 < 0.4
    # different salts draw (nearly) independently
    c = {r.doc_id for r in hash_sample(df, 0.3, salt="v2").collect()}
    assert c != a
    # fraction is monotone: a 0.1 sample nests inside the 0.3 sample
    d = {r.doc_id for r in hash_sample(df, 0.1).collect()}
    assert d <= a
    with pytest.raises(ValueError):
        hash_sample(df, 1.5)


def test_stratified_sample_exact_k_and_small_strata(spark):
    rows = [(i, "big") for i in range(100)] + [(1000, "tiny"), (1001, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, strata_col="lang", k=5).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r.doc_id)
    assert len(by["big"]) == 5
    assert sorted(by["tiny"]) == [1000, 1001]  # min(k, |stratum|)
    # deterministic across invocations
    again = stratified_sample(df, strata_col="lang", k=5).collect()
    assert sorted((r.lang, r.doc_id) for r in again) == \
        sorted((r.lang, r.doc_id) for r in out)


def test_pack_sequences_bins_by_start_offset(spark):
    # one shard; token counts 100, 100, 100 with budget 256:
    # offsets 0/100/200 -> bins 0/0/0; fourth doc starts at 300 -> bin 1
    rows = [(f"s", i, "w " * 99 + "w") for i in range(4)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r.doc_id: r for r in pack_sequences(df, budget_tokens=256).collect()}
    assert [out[i].tok_offset for i in range(4)] == [0, 100, 200, 300]
    assert [out[i].bin for i in range(4)] == [0, 0, 0, 1]
    assert all(out[i].n_tokens == 100 for i in range(4))


def test_pack_sequences_shards_are_independent(spark):
    rows = [("a", 1, "x y z"), ("b", 2, "p q"), ("a", 3, "m")]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {(r.source, r.doc_id): r
           for r in pack_sequences(df, budget_tokens=4).collect()}
    assert out[("a", 1)].tok_offset == 0
    assert out[("a", 3)].tok_offset == 3   # continues shard a's stream
    assert out[("b", 2)].tok_offset == 0   # shard b restarts at zero
    assert out[("a", 3)].bin == 0


# ------------------------------------------------------ mixture_resample
def test_mixture_resample_uniform_caps_and_downsamples(spark):
    from tool_documentsconverter_spark.operators.textprep import (
        mixture_resample,
    )

    rows = [(i, "web") for i in range(80)] + [
        (100 + i, "books") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_resample(df, "source", "doc_id", budget_frac=0.5)
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 100
    # uniform target = 0.5 * 100 / 2 = 25 docs per domain
    web = [r for r in got.values() if r.domain == "web"]
    books = [r for r in got.values() if r.domain == "books"]
    assert all(abs(r.p_keep - 0.3125) < 1e-9 for r in web)  # 25/80
    assert all(r.p_keep == 1.0 for r in books)  # capped: never up-sample
    assert all(r.kept for r in books)
    n_kept_web = sum(r.kept for r in web)
    assert 10 <= n_kept_web <= 40  # hash threshold, ~25 expected
    assert all(r.n_domain == 80 for r in web)


def test_mixture_resample_explicit_weights_and_determinism(spark):
    from tool_documentsconverter_spark.operators.textprep import (
        mixture_resample,
    )

    rows = [(i, ("a", "b")[i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_resample(df, "source", "doc_id", budget_frac=0.5,
                           weights={"a": 1.0}).collect()
    for r in out:
        if r.domain == "b":  # zero weight -> nothing kept
            assert r.p_keep == 0.0 and not r.kept
        else:  # 0.5 * 40 * 1.0 / 20 = 1.0
            assert r.p_keep == 1.0 and r.kept
    # partitioning-independent: same decisions after a repartition
    again = mixture_resample(df.repartition(7), "source", "doc_id",
                             budget_frac=0.5, weights={"a": 1.0}).collect()
    assert {(r.doc_id, r.kept) for r in again} == {
        (r.doc_id, r.kept) for r in out}


def test_mixture_resample_corpus_never_shuffled(spark):
    from tool_documentsconverter_spark.operators.textprep import (
        mixture_resample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string")
    plan = (mixture_resample(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
