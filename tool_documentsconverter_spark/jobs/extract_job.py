"""spark-submit entry point for the north-rule extraction job.

    spark-submit --py-files engine.zip \
        tool_documentsconverter_spark/jobs/extract_job.py \
        --input /path/transcripts --output /path/out \
        --lineage /path/lineage [--force] [--buckets 64]

Also runnable as plain `python -m tool_documentsconverter_spark.jobs.
extract_job --master local[8] ...` (used by scripts/scaling_evidence.py
to demonstrate N -> 4N scaling).  Prints ONE JSON summary line:
rows, ok/failed counts, elapsed seconds, turns/sec.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--salt", type=int, default=8)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--force", action="store_true")
    p.add_argument("--snapshot", default="")
    p.add_argument("--repeat", type=int, default=1,
                   help="run the pipeline N times (force on reruns) and "
                        "report each; last run is steady-state (warm "
                        "executors), mirroring a long-running cluster")
    args = p.parse_args(argv)

    from ..plans.pipeline import run_extract_job
    from ..session import get_spark

    spark = get_spark(app="extract-job", master=args.master)
    transcripts = spark.read.parquet(args.input)
    summary = None
    for run in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        summary = run_extract_job(
            spark, transcripts, args.output, args.lineage,
            n_buckets=args.buckets,
            force=args.force or run > 0,
            salt=args.salt,
            num_partitions=args.partitions,
            input_snapshot=args.snapshot or args.input,
        )
        elapsed = time.perf_counter() - t0
        print(json.dumps({
            "run": run,
            "rows_out": summary.rows_out,
            "ok": summary.ok,
            "failed": summary.failed,
            "buckets_processed": summary.buckets_processed,
            "buckets_skipped": summary.buckets_skipped,
            "elapsed_sec": round(elapsed, 3),
            "turns_per_sec": round(summary.rows_out / elapsed, 1) if elapsed else 0,
            "phases": summary.phase_seconds,
        }), flush=True)
    spark.stop()
    return 0 if summary and summary.rows_out >= 0 else 1


if __name__ == "__main__":
    sys.exit(main())
