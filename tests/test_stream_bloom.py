"""Incremental bloom decontamination: the union of per-batch flagged
partitions must equal the batch bloom_contamination operator on the
same input, including across a crash injected in foreachBatch's
at-least-once window (VERDICT r6 item 8)."""

import pytest

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators.dedup import (
    bloom_contamination,
    bloom_probe,
    fit_bloom_mask,
)
from tool_documentsconverter_spark.streaming.bloom_stream import (
    read_flagged,
    run_stream_bloom,
)

M_BITS = 1024


@pytest.fixture(scope="module")
def corpus(spark, sf_dir, tmp_path_factory):
    """documents subset as 6 files -> 3 micro-batches at
    maxFilesPerTrigger=2; the bench set is a slice of the same
    documents so real (non-FP) hits are guaranteed."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 96)
        .select("doc_id", "text")
    )
    bench = docs.where(F.col("doc_id") % 10 == 0)
    inp = str(tmp_path_factory.mktemp("bloom_stream") / "in")
    docs.repartition(6).write.parquet(inp)
    return inp, docs, bench


def _flagged(spark, out_dir):
    return sorted(
        (r.doc_id, r.flagged_shingles)
        for r in read_flagged(spark, out_dir).collect()
    )


@pytest.fixture(scope="module")
def batch_truth(spark, corpus):
    _, docs, bench = corpus
    return sorted(
        (r.doc_id, r.flagged_shingles)
        for r in bloom_contamination(docs, bench, "doc_id", "text",
                                     m_bits=M_BITS).collect()
    )


def test_incremental_equals_batch(spark, corpus, batch_truth, tmp_path):
    inp, _, bench = corpus
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_stream_bloom(spark, inp, bench, out, ckpt, m_bits=M_BITS,
                         max_files_per_trigger=2)
    q.awaitTermination(180)
    assert len(batch_truth) > 0  # bench docs flag themselves at least
    assert _flagged(spark, out) == batch_truth
    n_batches = (
        spark.read.parquet(out)
        .select("batch_id").distinct().count()
    )
    assert n_batches >= 2  # multiple micro-batches actually ran


def test_crash_between_write_and_commit(spark, corpus, batch_truth,
                                        tmp_path):
    inp, _, bench = corpus
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    boom = {"armed": True}

    def hook(batch_id):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before checkpoint commit")

    q = run_stream_bloom(spark, inp, bench, out, ckpt, m_bits=M_BITS,
                         max_files_per_trigger=2, batch_hook=hook)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        raise AssertionError("query should have died on the injection")

    # the uncommitted batch's output is on disk — the restart must
    # absorb it (idempotent overwrite), not double it
    assert spark.read.parquet(out).count() > 0
    q2 = run_stream_bloom(spark, inp, bench, out, ckpt, m_bits=M_BITS,
                          max_files_per_trigger=2)
    q2.awaitTermination(180)
    assert _flagged(spark, out) == batch_truth  # no loss, no duplication


def test_fit_once_probe_equals_combined_operator(spark, corpus):
    """The fit/probe split is lossless: probing with a pre-fitted mask
    equals the one-shot operator."""
    _, docs, bench = corpus
    mask = fit_bloom_mask(bench, "doc_id", "text", m_bits=M_BITS)
    assert len(mask) == M_BITS and set(mask) <= {"0", "1"}
    split = sorted(
        (r.doc_id, r.flagged_shingles)
        for r in bloom_probe(docs, mask, "doc_id", "text").collect()
    )
    combined = sorted(
        (r.doc_id, r.flagged_shingles)
        for r in bloom_contamination(docs, bench, "doc_id", "text",
                                     m_bits=M_BITS).collect()
    )
    assert split == combined
