"""Streaming exactly-once under FAILURE INJECTION (the batch twin is
tests/test_resume.py's kill/resume).  foreachBatch is at-least-once:
Spark commits a batch to the checkpoint only after foreachBatch
returns, so a crash after the sink write but before that commit
replays the whole batch on restart.  The sink must therefore be
idempotent — stream_extract overwrites a batch_id=N directory per
batch — and these tests pin both halves: no LOSS (everything the
killed run hadn't processed appears after restart) and no
DUPLICATION (the replayed batch doesn't double its rows)."""

import pytest

from tool_documentsconverter_spark.sources.transcripts import (
    write_transcripts,
)
from tool_documentsconverter_spark.streaming.stream_extract import (
    run_stream_extract,
)

N_TURNS = 120  # 16 input part-files at the default maxFilesPerTrigger=8
               # -> at least two micro-batches


def _rows(spark, out_dir):
    # drop the batch_id partition column: batch numbering is an
    # implementation detail of the run, not part of the output
    return sorted(
        (r.conv_id, r.turn_idx, r.md, r.status)
        for r in spark.read.parquet(out_dir)
        .select("conv_id", "turn_idx", "md", "status").collect()
    )


@pytest.fixture(scope="module")
def reference_run(spark, tmp_path_factory):
    """An uninterrupted run: the ground truth output."""
    base = tmp_path_factory.mktemp("stream_ref")
    inp = str(base / "in")
    write_transcripts(spark, inp, N_TURNS, partitions=16)
    out, ckpt = str(base / "out"), str(base / "ckpt")
    q = run_stream_extract(spark, inp, out, ckpt)
    q.awaitTermination(180)
    return inp, _rows(spark, out)


def test_crash_between_write_and_commit(spark, tmp_path, reference_run):
    inp, expected = reference_run
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    boom = {"armed": True}

    def hook(batch_id):
        # die AFTER the first batch's sink write, BEFORE Spark commits
        # it — the exact at-least-once window
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before checkpoint commit")

    q = run_stream_extract(spark, inp, out, ckpt, batch_hook=hook)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        raise AssertionError("query should have died on the injection")

    # batch 0's output exists on disk even though it was never
    # committed — the restart must absorb it, not double it
    assert spark.read.parquet(out).count() > 0

    q2 = run_stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(180)
    assert _rows(spark, out) == expected  # no loss, no duplication


def test_crash_then_restart_then_new_data(spark, tmp_path, reference_run):
    """After a crash-restart cycle the stream still picks up NEW files
    exactly once."""
    ref_inp, expected = reference_run
    # PRIVATE copy of the input dir: this test appends new files, and
    # mutating the module-scoped fixture's directory would poison any
    # test that runs after this one under reordering (xdist, --lf)
    import shutil as _sh

    inp = str(tmp_path / "in")
    _sh.copytree(ref_inp, inp)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    armed = {"v": True}

    def hook(batch_id):
        if armed["v"]:
            armed["v"] = False
            raise RuntimeError("injected crash")

    q = run_stream_extract(spark, inp, out, ckpt, batch_hook=hook)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        raise AssertionError("query should have died on the injection")
    q2 = run_stream_extract(spark, inp, out, ckpt)
    q2.awaitTermination(180)

    # land one more input file, restart again
    extra_dir = str(tmp_path / "extra")
    write_transcripts(spark, extra_dir, 10, partitions=1)
    import glob
    import shutil

    for i, part in enumerate(sorted(glob.glob(f"{extra_dir}/part-*.parquet"))):
        shutil.copy(part, f"{inp}/zz_extra_{i}.parquet")
    q3 = run_stream_extract(spark, inp, out, ckpt)
    q3.awaitTermination(180)

    got = _rows(spark, out)
    # exactly the original 120 + the 10 new rows: a replayed or
    # double-committed batch would overshoot, a lost one undershoot
    assert len(got) == N_TURNS + 10
    from collections import Counter

    have = Counter(got)
    missing = [row for row in expected if not have[row]]
    assert not missing, f"{len(missing)} reference rows lost"
