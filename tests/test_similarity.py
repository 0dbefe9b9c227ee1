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


def test_lsh_bucket_cap_truncates_to_smallest_ids(spark):
    """Round-8 cap rework (two-level smallest-k, no bucket window):
    with a bucket larger than max_bucket, only the max_bucket SMALLEST
    corpus ids in that bucket may appear as candidates — bit-identical
    to the old Window row_number <= max_bucket semantics."""
    # one identical vector everywhere -> every row lands in the same
    # (band, sig) bucket for every band
    rows = [(i, [1.0] * 8) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    got = SIM.lsh_topk(df, q, k=50, n_bands=2, bits_per_band=3, dim=8,
                       max_bucket=10).collect()
    neighbors = {r.neighbor_id for r in got}
    # bucket truncated to ids 0..9; id 0 is the query itself
    assert neighbors == set(range(1, 10))
    # and the cap must not disturb an under-cap run at all
    got_uncapped = SIM.lsh_topk(df, q, k=50, n_bands=2, bits_per_band=3,
                                dim=8, max_bucket=1000).collect()
    assert {r.neighbor_id for r in got_uncapped} == set(range(1, 30))


def test_lsh_bucket_cap_has_no_bucket_window(spark):
    """The cap subplan is aggregate + anti/semi joins — the only
    Window left in the whole lsh_topk plan is the per-query top-k
    (partitioned by query_id, bounded by the query count)."""
    rows = [(i, [1.0] * 8) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.where(F.col("vec_id") == 0)
    out = SIM.lsh_topk(df, q, k=5, n_bands=2, bits_per_band=3, dim=8,
                       max_bucket=10)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    import re

    # every window spec must partition by query_id (the top-k), never
    # by the bucket keys
    parts = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert parts and all(p == "query_id" for p in parts), parts
    # WindowGroupLimit (the row_number pushdown) may only key on
    # query_id either
    wgl = re.findall(r"WindowGroupLimit\nInput[^\n]*\nArguments: \[(\w+)",
                     plan)
    assert all(p == "query_id" for p in wgl), wgl
    assert "LeftAnti" in plan


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


def test_lsh_production_defaults_retrieve_neardup_twins(spark, emb):
    """The MEASURED recall claim for lsh_topk's production defaults
    (8 bands x 16 bits, bucket guard ON), on the workload banded LSH
    exists for — near-duplicate retrieval: a cos~0.99 perturbed twin
    of each query is planted in the corpus and must surface in the
    approximate top-5 for >= 95% of queries.  (On ISOTROPIC data with
    no cosine margin the same config recalls ~0 of the 'true top-5' —
    measured in scripts/ann_recall.py / BENCH/BASELINE.md — which is
    why general ANN over unclustered embeddings should use ivf_topk.)"""
    aug = SIM.plant_neardup_twins(emb.collect(), n_twins=50)
    corpus = spark.createDataFrame(
        aug, "vec_id long, embedding array<float>")
    twin_q = corpus.where(F.col("vec_id") < 50)
    got = {}
    for r in SIM.lsh_topk(corpus, twin_q, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for i in range(50) if 100_000 + i in got.get(i, set()))
    assert hits >= 48, f"twin recall {hits}/50 under production defaults"


def test_ivf_production_defaults_recall_floor(emb, queries, exact):
    """Measured floor at the production defaults (16 cells, 4 probed =
    a quarter of the corpus scanned): recall@5 >= 0.45 on the sf
    embeddings, and monotone in n_probe (8 probes >= the 4-probe
    recall, >= 0.6).  Point measurements: sf0.1 (scripts/ann_recall.py)
    0.608 @ 4 probes / 0.840 @ 8; sf0.01 (this fixture) 0.68 @ 8.
    Floors sit below the measurements on purpose — they are
    regression guards, not targets."""
    cents = SIM.fit_ivf_centroids(emb, n_cells=16)
    r4 = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4,
                              centroids=cents).collect()
    }
    r8 = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=8,
                              centroids=cents).collect()
    }
    rec4 = len(r4 & exact) / len(exact)
    rec8 = len(r8 & exact) / len(exact)
    assert rec4 >= 0.45, rec4
    assert rec8 >= 0.6, rec8
    assert rec8 >= rec4 - 1e-9


def test_quantized_recall_floor(spark, sf_dir):
    """int8 dequantized scoring must agree with exact cosine top-k:
    recall@5 >= 0.9 over the real embeddings table (64-dim float32 ->
    int8 loses <1% cosine accuracy; rank inversions are possible only
    between near-tied neighbors)."""
    from tool_documentsconverter_spark.operators.similarity import (
        brute_force_topk,
        quantized_brute_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    quant = quantized_brute_topk(emb, queries, k=5)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in quant.collect():
        total += 1
        if r.neighbor_id in truth[r.query_id]:
            hits += 1
    assert total == 5 * len(truth)
    assert hits / total >= 0.9, f"quantized recall {hits}/{total}"


def test_ivf_quantized_full_probe_equals_quantized_exact(emb, queries):
    """The composed int8-IVF path at full probe must equal the
    quantized brute-force exact top-k (same invariant ivf_topk pins
    against brute_force_topk — the IVF routing may not change results
    when every cell is probed)."""
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.quantized_brute_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.ivf_quantized_topk(emb, queries, k=5, n_cells=8,
                                        n_probe=8).collect()
    }
    assert got == want


def test_ivf_quantized_recall_floor(emb, queries, exact):
    """Production-probe recall floor for the int8-IVF serving shape vs
    the FLOAT exact baseline: quantization (<1% cosine error) stacked
    on half-probe IVF (floor 0.6 for the float path) — measured
    IDENTICAL to the float path on this table (0.608 at 16c/4probe,
    0.840 at 8probe, scripts/ann_recall.py): int8 error never flips a
    cell assignment or a top-5 rank here.  Pin >= 0.6 so the composed
    path can never silently fall below its weakest component."""
    got = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_quantized_topk(emb, queries, k=5, n_cells=8,
                                        n_probe=4).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall


def test_quantize_zero_vector_safe(spark):
    from tool_documentsconverter_spark.operators.similarity import (
        dequantize,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>")
    q = quantize_embeddings(df)
    rows = {r.vec_id: r for r in q.collect()}
    assert rows[0].scale == 0.0 and rows[0].qvec == [0, 0, 0]
    assert rows[1].scale == 2.0 and rows[1].qvec == [64, -127, 32]
    deq = q.select("vec_id", dequantize(F.col("qvec"), F.col("scale"))
                   .alias("v")).collect()
    v1 = dict((r.vec_id, r.v) for r in deq)[1]
    assert abs(v1[1] - (-2.0)) < 1e-9  # extreme component is exact
