"""ANN paths: exact brute force as ground truth; LSH and IVF variants
measured for recall against it."""

import pytest

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5)


@pytest.fixture(scope="module")
def exact(emb, queries):
    return {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }


def test_brute_force_shape(emb, queries, exact):
    assert len(exact) == 25  # 5 queries x top-5
    # rank 1 neighbor must have the max score per query
    rows = SIM.brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        scores = [r.score for r in sorted(rs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)


def test_ivf_recall_against_exact(emb, queries, exact):
    got = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=8,
                              n_probe=4).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall  # half the cells probed


def test_ivf_full_probe_equals_exact(emb, queries, exact):
    # probing every cell must recover the exact result
    got = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=8,
                              n_probe=8).collect()
    }
    assert got == exact


def test_lsh_candidates_subset_scored_correctly(emb, queries):
    rows = SIM.lsh_topk(emb, queries, k=5, n_planes=4, dim=64).collect()
    assert rows  # buckets are non-degenerate on this data
    for r in rows:
        assert -1.000001 <= r.score <= 1.000001
