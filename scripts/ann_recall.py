"""Measured ANN recall@k at PRODUCTION defaults vs the exact baseline.

The claim "recall comes from the OR across bands" (similarity.py
lsh_topk) and "n_probe trades recall for candidates" (ivf_topk) must
be numbers, not prose: this script runs brute_force_topk as ground
truth over $SPARK_GRAFT_SF_DIR's embeddings table, then the two
approximate paths at their production defaults, and prints a
recall@k table (JSON line + markdown rows for BENCH/BASELINE.md).

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 5
N_QUERIES = 50


def recall(approx_rows, exact: dict) -> float:
    got: dict = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(
        len(got.get(q, set()) & nbrs) / len(nbrs)
        for q, nbrs in exact.items()
    ) / len(exact)


def main() -> None:
    from pyspark.sql import functions as F

    from tool_documentsconverter_spark.operators import similarity as SIM
    from tool_documentsconverter_spark.session import get_spark

    spark = get_spark(app="ann_recall", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES).cache()

    exact: dict = {}
    for r in SIM.brute_force_topk(emb, queries, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    results = {}
    # LSH at production defaults: 8 bands x 16 bits, bucket guard ON.
    # NOTE the expected shape of this number: the driver's synthetic
    # embeddings are ISOTROPIC (no cluster structure), so "top-5
    # neighbors" have almost no cosine margin over the bulk — the
    # worst case for hyperplane LSH, whose per-band hit probability is
    # (1 - theta/pi)^bits.  The near-dup workload below is what the
    # operator is for.
    results["lsh_8x16_guarded_isotropic"] = recall(
        SIM.lsh_topk(emb, queries, k=K).collect(), exact)
    # IVF at production defaults: 16 cells, 4 probed (candidates ~ n/4)
    cents = SIM.fit_ivf_centroids(emb, n_cells=16)
    results["ivf_16c_4probe"] = recall(
        SIM.ivf_topk(emb, queries, k=K, n_cells=16, n_probe=4,
                     centroids=cents).collect(), exact)
    # IVF at 8 probes — the recall/cost midpoint
    results["ivf_16c_8probe"] = recall(
        SIM.ivf_topk(emb, queries, k=K, n_cells=16, n_probe=8,
                     centroids=cents).collect(), exact)
    # int8-code posting lists (ivf_quantized_topk) at the same
    # production probes — quantization error stacked on IVF routing,
    # measured against the FLOAT exact baseline (the number a serving
    # deployment actually cares about)
    results["ivf_quantized_16c_4probe"] = recall(
        SIM.ivf_quantized_topk(emb, queries, k=K, n_cells=16, n_probe=4,
                               centroids=cents).collect(), exact)
    results["ivf_quantized_16c_8probe"] = recall(
        SIM.ivf_quantized_topk(emb, queries, k=K, n_cells=16, n_probe=8,
                               centroids=cents).collect(), exact)

    # LSH on its PRODUCTION workload — near-duplicate retrieval: 100
    # perturbed twins (cos ~ 0.99) are planted in the corpus and the
    # metric is "twin retrieved in the approximate top-k".  The twin
    # generator is shared with the pytest floor (plant_neardup_twins)
    # so the baseline and the guard measure the same workload.
    aug = SIM.plant_neardup_twins(emb.collect(), n_twins=100)
    corpus = spark.createDataFrame(
        aug, "vec_id long, embedding array<float>").cache()
    twin_q = corpus.where(F.col("vec_id") < 100)
    got: dict = {}
    for r in SIM.lsh_topk(corpus, twin_q, k=K).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    results["lsh_8x16_guarded_neardup_twin"] = sum(
        1 for i in range(100) if 100_000 + i in got.get(i, set())) / 100.0

    print(json.dumps({"metric": "ann_recall_at_k", "k": K,
                      "n_vectors": n, "n_queries": N_QUERIES,
                      "sf_dir": SF_DIR, **{k2: round(v, 4)
                                           for k2, v in results.items()}}))
    for name, v in results.items():
        print(f"| {name} | {v:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
