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
