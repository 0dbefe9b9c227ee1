"""Mega-cluster guard: a boilerplate document duplicated m times puts
all m copies in the same LSH bucket for EVERY band — unguarded, the
self-join emits m^2 pairs per band.  The guard drops buckets above
max_bucket from pair generation, so the duplicate cluster produces
zero candidate pairs (exact dedup owns it) while normal near-dup
detection is untouched.
"""

from pyspark.sql import functions as F

from tool_documentsconverter_spark.operators.dedup import (
    exact_dedup_keys,
    minhash_lsh_pairs,
)


def _corpus(spark, n_dups: int):
    # n_dups identical boilerplate docs + a handful of distinct docs,
    # two of which are near-duplicates of each other
    rows = [(i, "standard disclaimer boilerplate text repeated everywhere")
            for i in range(n_dups)]
    rows += [
        (n_dups + 0, "the quick brown fox jumps over the lazy dog today"),
        (n_dups + 1, "the quick brown fox jumps over the lazy dog tonight"),
        (n_dups + 2, "completely different content about spark shuffles"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_guard_drops_mega_cluster_keeps_near_dups(spark):
    df = _corpus(spark, n_dups=500)
    pairs = minhash_lsh_pairs(df, "doc_id", "text", n_bands=4,
                              max_bucket=50).collect()
    ids_in_pairs = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    # no pair touches the 500-copy cluster (would be ~125k pairs)...
    assert all(i >= 500 for i in ids_in_pairs), sorted(ids_in_pairs)[:5]
    # ...but the genuine near-duplicate pair survives
    assert any((r.id_a, r.id_b) == (500, 501) for r in pairs)
    # and exact dedup still owns the mega-cluster
    exact = {r.content_md5: r for r in
             exact_dedup_keys(df, "doc_id", "text").collect()}
    assert max(r.dup_count for r in exact.values()) == 500


def test_guard_off_at_default_threshold(spark):
    # below the default cap the guard is a no-op: same pairs either way
    df = _corpus(spark, n_dups=10)
    guarded = {(r.id_a, r.id_b, r.shared_bands) for r in
               minhash_lsh_pairs(df, "doc_id", "text", n_bands=4).collect()}
    unguarded = {(r.id_a, r.id_b, r.shared_bands) for r in
                 minhash_lsh_pairs(df, "doc_id", "text", n_bands=4,
                                   max_bucket=10**9).collect()}
    assert guarded == unguarded
    # 10 identical docs -> 45 pairs at 4 shared bands each, plus the
    # near-dup pair
    assert sum(1 for a, b, _ in guarded if a < 10 and b < 10) == 45


def test_lsh_topk_bucket_cap_deterministic(spark):
    from tool_documentsconverter_spark.operators.similarity import lsh_topk

    # 60 vectors in ~identical directions collapse into one signature
    # bucket; the cap keeps only the lowest-id members as candidates
    rows = [(i, [1.0 + (i % 3) * 1e-4] * 8 + [0.5] * 8) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") == 0)
    capped = lsh_topk(df, queries, k=5, n_bands=1, bits_per_band=2,
                      dim=16, max_bucket=20)
    got = capped.collect()
    assert len(got) == 5
    assert all(r.neighbor_id < 20 for r in got)  # cap keeps lowest ids
    # uncapped agrees on ranking (same scores among the kept ids)
    full = {r.neighbor_id: r.rank
            for r in lsh_topk(df, queries, k=5, n_bands=1, bits_per_band=2,
                              dim=16, max_bucket=None).collect()}
    for r in got:
        assert full.get(r.neighbor_id) is not None


def test_embedding_cosine_dups_semantics(spark):
    from tool_documentsconverter_spark.operators.dedup import (
        embedding_cosine_dups,
        hashed_embedding,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # identical
        (2, "dog lazy the over jumps fox brown quick the"),  # permuted
        (3, "completely unrelated words zebra quantum flux"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = {r.doc_id: r.vec for r in
            hashed_embedding(df, "doc_id", "text").collect()}
    assert vecs[0] == vecs[1] == vecs[2]  # bag-of-tokens: order-blind
    assert vecs[0] != vecs[3]

    pairs = {(r.id_a, r.id_b): r.cosine for r in
             embedding_cosine_dups(df, "doc_id", "text",
                                   threshold=0.95).collect()}
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0
    assert not any(3 in p for p in pairs)


def test_embedding_cosine_dups_mega_bucket_guard(spark):
    """10k identical documents share every band signature — unguarded
    that bucket alone would emit ~50M pairs per band.  The max_bucket
    guard must exclude it (exact dedup owns that cluster) while the
    genuine near-dup pair among the distinct docs still surfaces."""
    from tool_documentsconverter_spark.operators.dedup import (
        embedding_cosine_dups,
    )

    n = 10_000
    boiler = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("standard disclaimer boilerplate text").alias("text"),
    )
    distinct = spark.createDataFrame(
        [(n + 0, "the quick brown fox jumps over the lazy dog today"),
         (n + 1, "the quick brown fox jumps over the lazy dog today now"),
         (n + 2, "completely different content about spark shuffles")],
        "doc_id long, text string",
    )
    df = boiler.unionByName(distinct)
    pairs = embedding_cosine_dups(
        df, "doc_id", "text", n_bands=4, bits_per_band=4,
        threshold=0.90, max_bucket=100,
    ).collect()  # completes in seconds; unguarded would OOM the test
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert all(i >= n for i in ids), sorted(ids)[:5]
    assert any((r.id_a, r.id_b) == (n, n + 1) for r in pairs)


def test_embedding_cosine_dups_banding_or_semantics(spark):
    """A pair is a candidate when ANY band's full signature matches —
    two vectors differing on one early hyperplane must still pair via a
    later band (single-signature LSH would have dropped them)."""
    from tool_documentsconverter_spark.operators.dedup import (
        embedding_cosine_dups,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta eta"),  # near-dup
        (2, "alpha beta gamma delta epsilon zeta"),      # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # with many narrow bands the near-dup pair survives at least one band
    got = {(r.id_a, r.id_b) for r in embedding_cosine_dups(
        df, "doc_id", "text", n_bands=8, bits_per_band=2,
        threshold=0.90).collect()}
    assert (0, 2) in got                      # exact dup always pairs
    assert (0, 1) in got and (1, 2) in got    # near-dup recalled via OR


def test_cluster_duplicates_components(spark):
    from tool_documentsconverter_spark.operators.dedup import (
        cluster_duplicates,
    )

    # two components: a 10-node CHAIN (worst-case diameter for label
    # propagation) and a triangle; ids interleaved to avoid accidental
    # ordering luck
    chain = [(i, i + 2) for i in range(0, 18, 2)]          # 0-2-4-...-18
    tri = [(1, 3), (3, 5), (1, 5)]
    pairs = spark.createDataFrame(chain + tri, "id_a long, id_b long")
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in cluster_duplicates(pairs).collect()}
    for n in range(0, 20, 2):
        assert got[n] == (0, 10), (n, got[n])
    for n in (1, 3, 5):
        assert got[n] == (1, 3)
    assert len(got) == 13  # nodes in pairs only; no phantom singletons
