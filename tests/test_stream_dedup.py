"""Incremental streaming dedup: the union of per-batch pair
partitions must equal the batch LSH operator's output over the full
corpus, and survive a crash in the at-least-once window with no lost
or duplicated pair (VERDICT r4 item 7)."""

import pytest

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators.dedup import minhash_lsh_pairs
from tool_documentsconverter_spark.streaming.dedup_stream import (
    read_pairs,
    run_stream_dedup,
)

N_BANDS = 4


@pytest.fixture(scope="module")
def corpus(spark, sf_dir, tmp_path_factory):
    """documents subset written as 6 files -> 3 micro-batches at
    maxFilesPerTrigger=2."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 64)
        .select("doc_id", "text")
    )
    inp = str(tmp_path_factory.mktemp("dedup_stream") / "in")
    docs.repartition(6).write.parquet(inp)
    return inp, docs


def _pairs(spark, pairs_dir):
    return sorted(
        (r.id_a, r.id_b, r.shared_bands)
        for r in read_pairs(spark, pairs_dir).collect()
    )


@pytest.fixture(scope="module")
def batch_truth(spark, corpus):
    _, docs = corpus
    return sorted(
        (r.id_a, r.id_b, r.shared_bands)
        for r in minhash_lsh_pairs(docs, "doc_id", "text",
                                   n_bands=N_BANDS).collect()
    )


def test_incremental_equals_batch(spark, corpus, batch_truth, tmp_path):
    inp, _ = corpus
    sig, pairs, ckpt = (str(tmp_path / d) for d in ("sig", "pairs", "ckpt"))
    q = run_stream_dedup(spark, inp, sig, pairs, ckpt,
                         n_bands=N_BANDS, max_files_per_trigger=2)
    q.awaitTermination(180)
    assert len(batch_truth) > 0  # the corpus has near-duplicates
    assert _pairs(spark, pairs) == batch_truth
    # more than one micro-batch actually ran (the split exercised
    # the old-vs-new join, not just the in-batch self-join)
    n_batches = (
        spark.read.parquet(sig).select("batch_id").distinct().count()
    )
    assert n_batches >= 2


def test_crash_between_write_and_commit(spark, corpus, batch_truth,
                                        tmp_path):
    """Die after batch 0's sig+pairs writes but before the checkpoint
    commit; the restart must replay batch 0 idempotently — final state
    identical to the uninterrupted run."""
    inp, _ = corpus
    sig, pairs, ckpt = (str(tmp_path / d) for d in ("sig", "pairs", "ckpt"))
    boom = {"armed": True}

    def hook(batch_id):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before checkpoint commit")

    q = run_stream_dedup(spark, inp, sig, pairs, ckpt, n_bands=N_BANDS,
                         max_files_per_trigger=2, batch_hook=hook)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        raise AssertionError("query should have died on the injection")

    # the crashed attempt left uncommitted batch-0 output on disk;
    # the replay must absorb it (overwrite), not double it, and the
    # < batch_id filter must keep it out of its own prev-side
    q2 = run_stream_dedup(spark, inp, sig, pairs, ckpt, n_bands=N_BANDS,
                          max_files_per_trigger=2)
    q2.awaitTermination(180)
    assert _pairs(spark, pairs) == batch_truth  # no loss, no duplication


def test_mega_bucket_guard_suppresses_pairs(spark, tmp_path):
    """Once a bucket's CUMULATIVE size exceeds max_bucket, no further
    pairs are emitted from it.  Incremental semantics are no-retract:
    pairs emitted while the bucket was still under the cap remain
    (a stream cannot unemit), so the invariant is an upper bound —
    never the quadratic blowup the batch guard also prevents."""
    rows = [(i, "identical boilerplate text repeated verbatim")
            for i in range(8)] + [(100, "a genuinely unique document")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "in")
    df.repartition(2).write.parquet(inp)
    sig, pairs, ckpt = (str(tmp_path / d) for d in ("sig", "pairs", "ckpt"))
    q = run_stream_dedup(spark, inp, sig, pairs, ckpt, n_bands=N_BANDS,
                         max_bucket=4, max_files_per_trigger=1)
    q.awaitTermination(180)
    got = _pairs(spark, pairs)
    # 8 identical docs: the full self-join would emit C(8,2)=28 pairs;
    # the guard caps emission at the pairs formed while <= 4 members
    # had arrived (at most C(4,2)=6), and the unique doc pairs with
    # nothing
    assert len(got) <= 6
    assert all(a < 8 and b < 8 for a, b, _ in got)


def test_compaction_converges_to_batch_after_cap_crossing(spark, tmp_path):
    """VERDICT r5 item 7: when a bucket crosses max_bucket MID-STREAM,
    the no-retract guard leaves already-emitted pairs behind — the
    compaction job must replay the committed signature table with the
    batch guard (final bucket sizes) and tombstone them, so the
    compacted view equals minhash_lsh_pairs over the full corpus."""
    from tool_documentsconverter_spark.streaming.dedup_stream import (
        compact_pairs,
        read_pairs_compacted,
    )

    # 8 identical docs (bucket grows 1 -> 8 across 1-file triggers,
    # crossing the cap of 4 mid-stream) + 2 genuinely near-dup docs
    # whose bucket STAYS under the cap (their pairs must survive
    # compaction untouched)
    rows = [(i, "identical boilerplate text repeated verbatim")
            for i in range(8)]
    rows += [(200, "rare phrase alpha beta gamma delta epsilon"),
             (201, "rare phrase alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "in")
    df.repartition(5).write.parquet(inp)
    sig, pairs, ckpt, comp = (str(tmp_path / d)
                              for d in ("sig", "pairs", "ckpt", "comp"))
    q = run_stream_dedup(spark, inp, sig, pairs, ckpt, n_bands=N_BANDS,
                         max_bucket=4, max_files_per_trigger=1)
    assert q.awaitTermination(180)

    truth = sorted(
        (r.id_a, r.id_b, r.shared_bands)
        for r in minhash_lsh_pairs(df, "doc_id", "text", n_bands=N_BANDS,
                                   max_bucket=4).collect()
    )
    # the survivor pair exists, so convergence below is not vacuous
    assert any(a == 200 and b == 201 for a, b, _ in truth)

    comp_df = compact_pairs(spark, sig, pairs, comp, max_bucket=4)
    got = sorted(
        (r.id_a, r.id_b, r.shared_bands)
        for r in read_pairs_compacted(spark, pairs, comp).collect()
    )
    assert got == truth
    # the compaction partition actually carried tombstones iff the
    # stream over-emitted (it does whenever >=2 of the identical docs
    # arrived before the cap was crossed)
    over_emitted = sorted(_pairs(spark, pairs)) != truth
    n_deletes = comp_df.where(F.col("op") == "delete").count()
    assert (n_deletes > 0) == over_emitted


def test_compaction_is_noop_when_no_cap_crossed(spark, corpus, batch_truth,
                                                tmp_path):
    """On an input where no bucket ever crosses the cap, compaction
    writes no delete/update/insert rows and the compacted view equals
    the plain union (and the batch operator)."""
    from tool_documentsconverter_spark.streaming.dedup_stream import (
        compact_pairs,
        read_pairs_compacted,
    )

    inp, _ = corpus
    sig, pairs, ckpt, comp = (str(tmp_path / d)
                              for d in ("sig", "pairs", "ckpt", "comp"))
    q = run_stream_dedup(spark, inp, sig, pairs, ckpt,
                         n_bands=N_BANDS, max_files_per_trigger=2)
    assert q.awaitTermination(180)
    comp_df = compact_pairs(spark, sig, pairs, comp)
    assert comp_df.count() == 0
    got = sorted(
        (r.id_a, r.id_b, r.shared_bands)
        for r in read_pairs_compacted(spark, pairs, comp).collect()
    )
    assert got == batch_truth
