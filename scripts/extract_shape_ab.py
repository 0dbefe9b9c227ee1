"""A/B the two plain-text execution shapes (operators/extract.py:
text_path='arrow' vs 'column') at 5M turns on both payload mixes —
the VERDICT r4 item-1 'benchmark both shapes, adopt the winner'
evidence.  Everything (input, output, lineage, shuffle) lives on
tmpfs so storage bandwidth does not mask the CPU-side difference;
each shape runs in a fresh JVM with one warm repeat (the steady-state
number a long-running cluster sees).

Usage: python scripts/extract_shape_ab.py [--turns 5000000]
       [--cores 32] [--mixes fixtures,realistic]
Writes BENCH/extract_shape_ab.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def prepare_input(path: str, n_turns: int, mix: str) -> None:
    from tool_documentsconverter_spark.session import get_spark
    from tool_documentsconverter_spark.sources.transcripts import write_transcripts

    spark = get_spark(app="ab-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    write_transcripts(spark, path, n_turns, mix=mix)
    spark.stop()


def run_shape(cores: int, input_path: str, workdir: str, shape: str) -> dict:
    out = os.path.join(workdir, f"out_{shape}")
    lin = os.path.join(workdir, f"lin_{shape}")
    for p in (out, lin):
        shutil.rmtree(p, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_DRIVER_MEM=f"{2 * cores}g",
               SPARK_GRAFT_LOCAL_DIR=os.path.join(workdir, "spark-local"))
    cmd = [
        sys.executable, "-m",
        "tool_documentsconverter_spark.jobs.extract_job",
        "--input", input_path, "--output", out, "--lineage", lin,
        "--master", f"local[{cores}]", "--partitions", str(cores * 2),
        "--force", "--repeat", "2", "--text-path", shape,
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=env, timeout=3600)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        raise RuntimeError(f"{shape} failed: {res.stderr[-2000:]}")
    runs = [json.loads(ln) for ln in lines]
    return {"cold": runs[0], "warm": max(runs[1:] or runs,
                                         key=lambda r: r["turns_per_sec"])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=5_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--mixes", default="fixtures,realistic")
    args = ap.parse_args()

    results: dict = {"turns": args.turns, "cores": args.cores, "mixes": {}}
    for mix in args.mixes.split(","):
        workdir = tempfile.mkdtemp(prefix=f"shape_ab_{mix}_", dir="/dev/shm")
        try:
            inp = os.path.join(workdir, "input")
            print(f"[{mix}] preparing {args.turns} turns on tmpfs...",
                  flush=True)
            prepare_input(inp, args.turns, mix)
            per_mix = {}
            # interleave shapes so slow host drift hits both equally
            for shape in ("arrow", "column", "arrow2", "column2"):
                real = shape.rstrip("2")
                r = run_shape(args.cores, inp, workdir, real)
                best = per_mix.get(real)
                if best is None or (r["warm"]["turns_per_sec"]
                                    > best["warm"]["turns_per_sec"]):
                    per_mix[real] = r
                print(f"[{mix}] {shape:8s}: warm "
                      f"{r['warm']['turns_per_sec']:9.1f} turns/s  "
                      f"(cold {r['cold']['turns_per_sec']:9.1f})",
                      flush=True)
            results["mixes"][mix] = per_mix
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "extract_shape_ab.json"), "w") as f:
        json.dump(results, f, indent=2)
    for mix, shapes in results["mixes"].items():
        a = shapes["arrow"]["warm"]["turns_per_sec"]
        c = shapes["column"]["warm"]["turns_per_sec"]
        print(f"{mix}: arrow {a:.0f} vs column {c:.0f} turns/s "
              f"-> winner {'arrow' if a >= c else 'column'}")


if __name__ == "__main__":
    main()
