"""Time individual declared queries: min-of-N .count() like bench.py
(same methodology, subset of queries) — the round-8 optimization A/B
harness.  Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/time_queries.py [-n 3] q1 q2 ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    import __spark_entry__ as E
    from tool_documentsconverter_spark.session import get_spark

    spark = get_spark(app="time-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in args:
        fn = qs[name]
        fn(spark, SF_DIR).count()  # warm (workers, code paths)
        best, first = float("inf"), None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            if first is None:
                first = dt
            best = min(best, dt)
        print(f"{name:28s} min {best:7.3f}s  first {first:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
