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


def test_ivf_prefit_centroids_reused(emb, queries, exact):
    """The production shape: fit once, pass the centroid list to every
    ivf_topk call.  The fit is deterministic (seeded), and a prefit
    full-probe run still equals the exact top-k."""
    c1 = SIM.fit_ivf_centroids(emb, n_cells=8)
    c2 = SIM.fit_ivf_centroids(emb, n_cells=8)
    assert c1 == c2  # seeded numpy Lloyd's: bit-identical refits
    got = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8,
                              centroids=c1).collect()
    }
    assert got == exact
    # wrong cell count is rejected loudly, not silently mis-assigned
    with pytest.raises(ValueError):
        SIM.ivf_topk(emb, queries, n_cells=16, centroids=c1)


def test_lsh_candidates_subset_scored_correctly(emb, queries):
    rows = SIM.lsh_topk(emb, queries, k=5, n_bands=4, bits_per_band=4,
                        dim=64).collect()
    assert rows  # buckets are non-degenerate on this data
    for r in rows:
        assert -1.000001 <= r.score <= 1.000001


def test_lsh_banding_improves_recall(emb, queries, exact):
    """OR-of-bands recall monotonicity: 4 bands of 4 bits must recall
    at least what the single 4-bit band (the oracle config) recalls —
    band 0's candidates are a subset of the banded candidate set by
    construction (same plane indices 0..3)."""
    single = {
        (r.query_id, r.neighbor_id)
        for r in SIM.lsh_topk(emb, queries, k=5, n_bands=1,
                              bits_per_band=4, dim=64,
                              max_bucket=None).collect()
    }
    banded = {
        (r.query_id, r.neighbor_id)
        for r in SIM.lsh_topk(emb, queries, k=5, n_bands=4,
                              bits_per_band=4, dim=64,
                              max_bucket=None).collect()
    }
    assert len(banded & exact) >= len(single & exact)


def test_lsh_no_duplicate_pairs_across_bands(emb, queries):
    """A (query, neighbor) sharing several band signatures must appear
    exactly once — candidates are deduped before scoring."""
    rows = SIM.lsh_topk(emb, queries, k=50, n_bands=8, bits_per_band=2,
                        dim=64).collect()
    seen = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(seen) == len(set(seen))


def test_ivf_empty_cell_reseeds_are_distinct(spark):
    # ADVICE r3: every empty cell in a Lloyd's round used to reseed to
    # the SAME farthest point, leaving duplicate centroids that can
    # never separate.  Duplicate-heavy data with a few distinct
    # outliers forces empty cells on round 1; with distinct successive
    # reseeds the fitted centroids must be pairwise distinct.
    rows = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [(20 + i, [v, v, v, v])
             for i, v in enumerate((100.0, 200.0, 300.0, 400.0))]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    for seed in (0, 1, 42):
        cents = SIM.fit_ivf_centroids(df, n_cells=5, seed=seed, n_iter=2)
        assert len({tuple(round(v, 9) for v in c) for c in cents}) == 5
