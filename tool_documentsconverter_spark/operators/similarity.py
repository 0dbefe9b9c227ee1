"""Similarity search over an embedding column (array<float>).

Two paths:
 - brute-force cosine top-k: broadcast the (small) query set, score
   every corpus vector with built-in higher-order functions
   (zip_with + aggregate — JVM-side, codegen'd), window top-k.
   Exact; the baseline and the oracle-checkable path.
 - LSH-bucketed ANN (random-hyperplane signatures): corpus and queries
   are bucketed by a b-bit sign signature; only same-bucket pairs are
   scored.  At 100 TB this turns the all-pairs score into an equi-join
   on the signature — the classic scale path; recall is tunable via
   bands/bits.  Hyperplanes are derived deterministically from md5 of
   (plane, dim) so executors and the test oracle agree without
   shipping a random state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, score).

    The query side is broadcast (it is small by construction); the
    corpus is scanned once, scoring stays inside codegen (zip_with /
    aggregate are Catalyst higher-order functions, no Python).  Top-k
    per query via window row_number — the shuffle is (n_queries x
    corpus_partitions) partial top-k rows only when AQE coalesces,
    otherwise a per-query sort of scored rows."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(
                cosine(
                    F.transform("qvec", lambda x: x.cast("double")),
                    F.transform("cvec", lambda x: x.cast("double")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def hyperplane_sign(vec, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: weight of dimension d in
    plane p = (digit value of md5(p||':'||d) first hex char) - 7.5,
    i.e. a fixed sign/magnitude pattern both engines can recompute."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    weights = F.transform(
        idx,
        lambda d: F.conv(
            F.substring(F.md5(F.concat(F.lit(str(plane) + ":"), d.cast("string"))), 1, 1),
            16, 10,
        ).cast("double") - 7.5,
    )
    return F.when(_dot(F.transform(vec, lambda x: x.cast("double")), weights) >= 0,
                  F.lit("1")).otherwise(F.lit("0"))


def lsh_signature(vec, n_planes: int, dim: int):
    return F.concat(*[hyperplane_sign(vec, p, dim) for p in range(n_planes)])


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, train_cap: int = 100_000) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans partitions the corpus into
    n_cells Voronoi cells; each query scores only the n_probe nearest
    cells.  The scale path when LSH recall is insufficient: expected
    candidates = n * n_probe / n_cells, and the cell assignment is an
    equi-join key exactly like the LSH signature.  Deterministic via
    fixed seed; KMeans trains on a seeded sample capped at `train_cap`
    rows (centroid quality needs only a sketch of the distribution —
    fitting the full corpus at 100 TB would ship every vector through
    the ML pipeline for no recall gain).  Returns (query_id,
    neighbor_id, rank, score) like the exact path, so recall against
    brute_force_topk is directly measurable; with n_probe == n_cells
    every cell is probed and the result equals the exact top-k
    regardless of centroid placement."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    n = corpus.count()
    sampled = corpus
    if n > train_cap:
        sampled = corpus.sample(
            withReplacement=False, fraction=min(1.0, 1.1 * train_cap / n),
            seed=seed,
        ).limit(train_cap)
    train = sampled.select(
        array_to_vector(
            F.transform(vec_col, lambda x: x.cast("double"))
        ).alias("features")
    )
    # cache for the fit only: every KMeans iteration re-reads its input,
    # and the training set is bounded by train_cap rows by construction
    train.persist()
    try:
        model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    finally:
        train.unpersist()

    # centroids as a BROADCAST table, not unrolled literal expressions:
    # an n_cells x dim literal Column tree costs O(cells * dim) driver
    # plan-build time and blows up codegen, while a broadcast join of
    # n_cells tiny rows keeps the plan constant-size at ANY cell count
    cents = spark.createDataFrame(
        [(i, [float(v) for v in c])
         for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )

    def _d2(vec, cent):
        return F.aggregate(
            F.zip_with(F.transform(vec, lambda x: x.cast("double")), cent,
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, v: a + v,
        )

    # corpus cell = argmin over the broadcast centroids: min_by inside
    # a map-side-combinable groupBy (n_cells rows per vector pre-agg)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d2", _d2(F.col("cvec"), F.col("centroid")))
        .groupBy("neighbor_id")
        .agg(F.min(F.struct("d2", "cell"))["cell"].alias("cell"),
             F.first("cvec").alias("cvec"))
    )  # struct-min: deterministic tie-break on the lowest cell id

    # each query probes its n_probe nearest cells: rank centroid
    # distances per query, keep n_probe -> equi-join key
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d2", _d2(F.col("qvec"), F.col("centroid")))
        .withColumn("cell_rank", F.row_number().over(wq))
        .where(F.col("cell_rank") <= n_probe)
        .select("query_id", "qvec", "cell")
    )

    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(
                cosine(
                    F.transform("qvec", lambda x: x.cast("double")),
                    F.transform("cvec", lambda x: x.cast("double")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_bucket: int | None = None) -> DataFrame:
    """ANN: score only same-signature candidates.  Equi-join on the
    b-bit bucket replaces the cross join; expected candidate set is
    n / 2^b per query.

    `max_bucket` (optional) is the mega-cluster guard: when a signature
    bucket holds more than max_bucket corpus vectors (a degenerate
    near-duplicate cluster), only the max_bucket lowest-id members stay
    candidates — deterministic, and recall on such clusters is
    unaffected in practice because its members are near-identical.
    Left off by default so the md5-replayable oracle sees the full
    join; turn it on for skewed production corpora."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("sig"),
    )
    if max_bucket is not None:
        wb = Window.partitionBy("sig").orderBy(F.asc("neighbor_id"))
        c = (
            c.withColumn("_bn", F.row_number().over(wb))
            .where(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("sig"),
    )
    scored = (
        c.join(F.broadcast(q), on="sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            F.round(
                cosine(
                    F.transform("qvec", lambda x: x.cast("double")),
                    F.transform("cvec", lambda x: x.cast("double")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )
