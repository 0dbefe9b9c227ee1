"""North-rule determinism: the SAME input produces byte-identical
per-turn Markdown at different parallelism levels (fresh JVM each,
local[2] vs local[4]) under stable (conv_id, turn_idx) ordering.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(cores: int, inp: str, out: str, lin: str) -> dict:
    cmd = [
        sys.executable, "-m",
        "tool_documentsconverter_spark.jobs.extract_job",
        "--input", inp, "--output", out, "--lineage", lin,
        "--master", f"local[{cores}]", "--partitions", str(cores * 2),
        "--buckets", "8", "--force",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=env, timeout=400)
    assert res.returncode == 0, res.stderr[-2000:]
    return json.loads(
        [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    )


def test_output_bytes_identical_across_parallelism(spark, tmp_path):
    import duckdb

    from tool_documentsconverter_spark.sources.transcripts import write_transcripts

    inp = str(tmp_path / "in")
    write_transcripts(spark, inp, 400)

    outs = {}
    for cores in (2, 4):
        out = str(tmp_path / f"out{cores}")
        lin = str(tmp_path / f"lin{cores}")
        s = _run_job(cores, inp, out, lin)
        assert s["rows_out"] == 400
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT conv_id, turn_idx, md, status "
            f"FROM '{out}/bucket=*/*.parquet' ORDER BY conv_id, turn_idx"
        ).fetchall()
        outs[cores] = rows
    assert outs[2] == outs[4]  # byte-identical under stable ordering
