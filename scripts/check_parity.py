"""Local mini-driver: run every queries() entry on Spark AND its
oracle_sql() twin on DuckDB at sf0.01, compare row-count, column
names/order-insensitive values, and report per-query PASS/FAIL with a
first-diff sample.  Emulates the driver's CORRECTNESS gate so parity
bugs surface before the round ends.

Usage: python scripts/check_parity.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(v)
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("\x1f".join(normalize(row[i]) for i in order))
    out.sort()
    return sorted(cols), out


def main(selected):
    import duckdb

    import __spark_entry__ as E
    from tool_documentsconverter_spark.session import get_spark

    spark = get_spark(app="parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    names = selected or list(qs)
    failures = []
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        s_cols, s_vals = frame_key(scols, [list(r) for r in srows])
        d_cols, d_vals = frame_key(dcols, [list(r) for r in drows])
        if s_cols != d_cols:
            print(f"FAIL  {name}: schema {s_cols} vs {d_cols}")
            failures.append(name)
            continue
        if len(s_vals) != len(d_vals):
            print(f"FAIL  {name}: rows {len(s_vals)} vs {len(d_vals)}")
            failures.append(name)
            continue
        if s_vals != d_vals:
            diffs = [
                (a, b) for a, b in zip(s_vals, d_vals) if a != b
            ][:3]
            print(f"FAIL  {name}: {len([1 for a,b in zip(s_vals,d_vals) if a!=b])} row diffs; first: ")
            for a, b in diffs:
                print(f"      spark:  {a[:200]}")
                print(f"      duckdb: {b[:200]}")
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(s_vals)} rows")

    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
