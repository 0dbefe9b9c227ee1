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

from ..plans.fanout import fan_out


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
    c = fan_out(corpus).select(
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


def hyperplane_weights(plane: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplane: weight of dimension d in
    plane p = (digit value of md5(p||':'||d) first hex char) - 7.5,
    i.e. a fixed sign/magnitude pattern both engines can recompute
    (the SQL oracle replays the same md5 derivation)."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(dim)
    ]


def hyperplane_sign(vec, plane: int, dim: int):
    """Sign bit of ``vec`` against plane ``plane``.  The weights are
    CONSTANTS (they depend only on plane/dim, never on the row), so
    they are derived driver-side and embedded as literals — the naive
    formulation (``transform(sequence(...), d -> md5(...))`` inside
    the row expression) recomputes plane*dim md5 hashes for EVERY ROW:
    at 8 bands x 16 bits x 64 dims that is 8192 md5 calls per corpus
    row, pure waste at any scale."""
    weights = F.array(*[F.lit(w) for w in hyperplane_weights(plane, dim)])
    return F.when(_dot(F.transform(vec, lambda x: x.cast("double")), weights) >= 0,
                  F.lit("1")).otherwise(F.lit("0"))


def lsh_signature(vec, n_planes: int, dim: int):
    return F.concat(*[hyperplane_sign(vec, p, dim) for p in range(n_planes)])


def plant_neardup_twins(rows, n_twins: int = 100, seed: int = 7,
                        id_offset: int = 100_000) -> list:
    """Augment collected (vec_id, embedding) rows with a perturbed
    near-duplicate twin (cos ~ 0.99: per-component gaussian noise
    0.05·|x|+0.01) for each of the first ``n_twins`` ids.  This is the
    ONE definition of the twin-recall workload behind the measured LSH
    number in BENCH/BASELINE.md (scripts/ann_recall.py) and its pytest
    floor (tests/test_similarity.py) — shared so the baseline and the
    regression guard cannot drift apart."""
    import random

    rnd = random.Random(seed)
    aug = []
    for r in rows:
        v = [float(x) for x in r.embedding]
        aug.append((r.vec_id, v))
        if r.vec_id < n_twins:
            aug.append((id_offset + r.vec_id,
                        [x + rnd.gauss(0, 0.05 * abs(x) + 0.01)
                         for x in v]))
    return aug


def fit_ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                      seed: int = 42, train_cap: int = 100_000,
                      train_fraction: float = 1.0, n_iter: int = 10,
                      vec_col: str = "embedding") -> list:
    """Fit the IVF coarse quantizer ONCE and return its centroids as a
    plain ``list[list[float]]`` — the artifact callers persist and
    reuse across ivf_topk invocations (refitting per query-batch burns
    a full KMeans job each call for identical centroids).

    Centroid quality needs only a sketch of the distribution, so the
    fit runs driver-side over a bounded sample — never a ``count()``
    pass: ``sample(fraction)`` when given (pushed into the scan; set
    train_fraction ~ train_cap / n at corpus scale), then a
    PER-PARTITION capped take (each input partition contributes at
    most ceil(train_cap / n_partitions) rows).  A bare
    ``limit(train_cap)`` would read whatever the first partitions
    yield — on a corpus laid out by source/time that is a biased
    prefix (one shard's vectors), and partitioning-dependent to boot;
    the per-partition cap spreads the sample across every shard at
    the same cost.  (When n_partitions exceeds train_cap the cap
    degenerates to 1-row-per-partition and the take is again a
    partition-order prefix — of one row per shard, which is still far
    less skewed than a whole-shard prefix; set train_fraction for a
    truly uniform sample at that scale.)  The collected matrix is at
    most train_cap x dim doubles (100k x 64 = 51 MB, a bounded driver
    read by construction, NOT a corpus collect).  Deterministic for a
    fixed file layout: seeded init, argmin ties resolve to the lowest
    cell, empty cells reseed to successive distinct farthest points."""
    import numpy as np

    # fan_out BEFORE the cast-transform and the RDD pickle: a
    # single-file scan otherwise runs the whole sample extraction on
    # one core (measured 5.7s -> 0.9s at sf1.0; no-op on multi-split
    # scans).  The repartition happens before the per-partition cap,
    # so the cap spreads over default-parallelism partitions instead
    # of one — same bounded row count, less biased if anything.
    sampled = fan_out(corpus).select(
        F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    if train_fraction < 1.0:
        sampled = sampled.sample(False, train_fraction, seed)
    n_parts = max(1, sampled.rdd.getNumPartitions())
    # ceil: uneven partitions then under-fill instead of the whole
    # take landing short of train_cap
    per_part = max(1, -(-train_cap // n_parts))

    def _take(it):
        import itertools

        return itertools.islice(it, per_part)

    rows = sampled.rdd.mapPartitions(_take).take(train_cap)
    x = np.asarray([r.v for r in rows], dtype=np.float64)
    if len(x) < n_cells:
        raise ValueError(
            f"training sample ({len(x)} rows) smaller than n_cells "
            f"({n_cells}) — raise train_fraction or lower n_cells")
    rng = np.random.default_rng(seed)
    cents = x[rng.permutation(len(x))[:n_cells]].copy()
    for _ in range(n_iter):
        # ||x-c||^2 via the expansion — never materializes n x k x dim
        d2 = ((x * x).sum(1)[:, None] + (cents * cents).sum(1)[None, :]
              - 2.0 * (x @ cents.T))
        assign = d2.argmin(1)
        # Empty cells reseed to SUCCESSIVE farthest points (by current
        # assignment distance, each point used at most once per round)
        # — reseeding every empty cell to the same argmax would create
        # duplicate centroids that can never separate, permanently
        # degrading partition quality (reduced-probe recall).
        # itertools.cycle, not a bare iterator: the n_cells <= len(x)
        # guard above makes exhaustion unreachable today, but a future
        # degenerate call path (more empty cells than sampled points)
        # must degrade to duplicate centroids, never crash with a bare
        # StopIteration out of the fit loop
        import itertools

        far_order = itertools.cycle(np.argsort(-d2.min(1), kind="stable"))
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(0)
            else:
                cents[j] = x[next(far_order)]
    return [c.tolist() for c in cents]


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, train_cap: int = 100_000,
             centroids: list | None = None) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer partitions the
    corpus into n_cells Voronoi cells; each query scores only the
    n_probe nearest cells.  The scale path when LSH recall is
    insufficient: expected candidates = n * n_probe / n_cells, and the
    cell assignment is an equi-join key exactly like the LSH signature.

    ``centroids`` is the prefit model from :func:`fit_ivf_centroids` —
    pass it to reuse one fit across many query batches (the production
    shape: fit once, persist the list, never refit in the query path).
    When omitted, a fit runs inline for convenience.  Returns
    (query_id, neighbor_id, rank, score) like the exact path, so recall
    against brute_force_topk is directly measurable; with n_probe ==
    n_cells every cell is probed and the result equals the exact top-k
    regardless of centroid placement."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, n_cells=n_cells, seed=seed,
                                      train_cap=train_cap, vec_col=vec_col)
    if len(centroids) != n_cells:
        raise ValueError(f"centroids has {len(centroids)} cells, "
                         f"expected n_cells={n_cells}")
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    return _ivf_search(spark, c, q, centroids, n_probe, k)


def _ivf_search(spark, corpus_side: DataFrame, query_side: DataFrame,
                centroids: list, n_probe: int, k: int,
                score_col: str = "cvec") -> DataFrame:
    """Shared IVF probe/score plan over a prepared corpus side
    ``corpus_side = (neighbor_id, cvec [, score_col])`` and query side
    ``query_side = (query_id, qvec)`` — the float path (ivf_topk) and the int8-code path
    (ivf_quantized_topk) differ only in how ``cvec`` is produced.
    ``cvec`` drives cell assignment; ``score_col`` (default the same
    column) is what the cosine scores against — the quantized path
    passes the raw int8 codes there, because cosine is invariant
    under the positive per-vector dequantize scale, which keeps the
    quantize->dequantize chain out of the scoring expression
    entirely.

    See the comment block below for why centroids ride as one
    broadcast row."""
    # centroids as ONE broadcast row holding an array<array<double>>
    # column — not unrolled literal expressions (an n_cells x dim
    # literal Column tree costs O(cells * dim) driver plan-build time
    # and blows up codegen), and not an n_cells-row table either: the
    # earlier crossJoin(cells)+groupBy(argmin) shape paid a FULL
    # CORPUS SHUFFLE just to assign cells.  With the array attached by
    # a broadcast single-row join, the argmin is a higher-order
    # aggregate evaluated per row inside the scan stage — ZERO
    # shuffles between the parquet read and the probe join.
    # (comment block kept verbatim from the pre-refactor ivf_topk)
    cent_arr = spark.createDataFrame(
        [([[float(v) for v in c] for c in centroids],)],
        "cents array<array<double>>",
    )

    def _d2(vec, cent):
        return F.aggregate(
            F.zip_with(F.transform(vec, lambda x: x.cast("double")), cent,
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, v: a + v,
        )

    def _argmin_cell(vec):
        # min over (d2, cell) structs: deterministic tie-break on the
        # lowest cell id, same semantics as the old struct-min groupBy
        scored_cells = F.transform(
            F.col("cents"),
            lambda cent, i: F.struct(_d2(vec, cent).alias("d2"),
                                     i.alias("cell")),
        )
        return F.array_min(scored_cells)["cell"]

    c = (
        fan_out(corpus_side)
        .crossJoin(F.broadcast(cent_arr))
        .withColumn("cell", _argmin_cell(F.col("cvec")))
        .drop("cents", *([] if score_col == "cvec" else ["cvec"]))
    )

    # each query probes its n_probe nearest cells: rank all cell
    # distances per query (the query side is small, so explode + window
    # is cheap), keep n_probe -> equi-join key
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    q = (
        query_side
        .crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id", "qvec",
            F.explode(
                F.transform(
                    F.col("cents"),
                    lambda cent, i: F.struct(
                        _d2(F.col("qvec"), cent).alias("d2"),
                        i.alias("cell"),
                    ),
                )
            ).alias("dc"),
        )
        .select("query_id", "qvec", F.col("dc.d2").alias("d2"),
                F.col("dc.cell").alias("cell"))
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
                    F.transform(score_col, lambda x: x.cast("double")),
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


def banded_signatures(df: DataFrame, out_id: str, n_bands: int,
                      bits_per_band: int, dim: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(out_id, band, sig): band b's signature is bits_per_band
    hyperplane sign bits over global plane indices b*bits .. b*bits+
    bits-1 — the same convention as dedup.embedding_cosine_dups, so
    n_bands=1 reproduces the single-signature shape and oracles can
    replay any configuration."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[
                hyperplane_sign(F.col(vec_col),
                                b * bits_per_band + j, dim)
                for j in range(bits_per_band)
            ]).alias("sig"),
        )
        for b in range(n_bands)
    ])
    return (
        df.select(F.col(id_col).alias(out_id), F.explode(bands).alias("bs"))
        .select(out_id, F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"))
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_bands: int = 8, bits_per_band: int = 16, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_bucket: int | None = 1000) -> DataFrame:
    """ANN: score only candidates sharing ANY band signature with the
    query (banded random-hyperplane LSH).  Per band the equi-join on a
    bits_per_band-bit bucket replaces the cross join — expected
    candidates = n_bands * n / 2^bits per query — and recall comes from
    the OR across bands, so each band affords enough bits to stay
    selective (the production default 8x16 gives 65k buckets/band; a
    single-band low-bit signature would need huge buckets for the same
    recall).

    MEASURED recall at the 8x16 defaults (scripts/ann_recall.py,
    BENCH/BASELINE.md round-4 table): near-duplicate retrieval —
    the workload banded LSH exists for — finds a planted cos≈0.99
    twin in the top-5 for 100/100 queries; but on ISOTROPIC
    embeddings with no cosine margin the same config recalls ~0 of
    the "true top-5" (per-band hit probability (1-θ/π)^bits collapses
    at large θ), and no band/bit shape fixes that short of
    brute-force-scale candidate fractions.  Use this operator for
    near-dup/member lookup over clustered data; use ivf_topk for
    general ANN over unclustered embeddings (measured 0.61-0.84
    recall at n/4-n/2 candidates).

    Candidates are deduped to (query, neighbor) BEFORE the
    vectors join back for scoring, so banding never re-scores a pair.

    `max_bucket` (default ON — production corpora are skewed) is the
    mega-cluster guard: when a band's bucket holds more than max_bucket
    corpus vectors (a degenerate near-duplicate cluster), only the
    max_bucket lowest-id members stay candidates — deterministic, and
    recall on such clusters is unaffected in practice because its
    members are near-identical.  Pass None for the exhaustive join
    (e.g. the md5-replayable CORRECTNESS oracle, which pins n_bands=1 x
    4 bits so DuckDB can replay the signature)."""
    # fan_out only the CORPUS side: the sign-bit computation is
    # n_bands x bits x dim per-row codegen work (the query side is
    # tiny and a repartition there is pure overhead)
    c = banded_signatures(fan_out(corpus), "neighbor_id", n_bands,
                          bits_per_band, dim, id_col, vec_col)
    if max_bucket is not None:
        # Round-8 (verdict item 2): deterministic lowest-id truncation
        # WITHOUT a bucket-partition window.  The old
        # Window.partitionBy(band, sig) row_number made the window
        # partition the bucket itself — one degenerate near-dup bucket
        # serialized through one task, the exact shape round 7 removed
        # from the MinHash family.  Now: a combinable bucket-size
        # aggregate finds the over-cap buckets (usually none/tiny);
        # under-cap rows pass untouched via LeftAnti; over-cap rows
        # are truncated with a TWO-LEVEL smallest-k — per (bucket,
        # salt-of-id) partial sorted lists capped at max_bucket, then
        # one bounded merge of at most _CAP_SALTS x max_bucket ids per
        # bucket — so no task ever materializes a whole mega-bucket.
        # Output is bit-identical to the window form (the max_bucket
        # smallest neighbor ids per over-cap bucket; ids are unique).
        sizes = c.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("_n"))
        over = sizes.where(F.col("_n") > max_bucket).select("band", "sig")
        under = c.join(over, ["band", "sig"], "left_anti")
        _CAP_SALTS = 64
        capped = (
            c.join(over, ["band", "sig"], "left_semi")
            .groupBy(
                "band", "sig",
                F.pmod(F.xxhash64("neighbor_id"),
                       F.lit(_CAP_SALTS)).alias("_s"))
            .agg(F.slice(F.array_sort(F.collect_list("neighbor_id")),
                         1, max_bucket).alias("_ids"))
            .groupBy("band", "sig")
            .agg(F.slice(F.array_sort(F.flatten(F.collect_list("_ids"))),
                         1, max_bucket).alias("_ids"))
            .select(F.explode("_ids").alias("neighbor_id"), "band", "sig")
        )
        c = under.unionByName(capped)
    q = banded_signatures(queries, "query_id", n_bands, bits_per_band,
                          dim, id_col, vec_col)
    cand = (
        c.join(F.broadcast(q), on=["band", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cvecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qvec"))
    scored = (
        cand.join(cvecs, on="neighbor_id")
        .join(F.broadcast(qvecs), on="query_id")
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


# ---------------------------------------------------------------------------
# int8 embedding quantization — the storage/bandwidth lever for ANN at
# corpus scale: a 64-dim float32 vector is 256 bytes; symmetric int8
# (per-vector scale + 64 bytes) is 4x smaller, which at 10^12 rows is
# the difference between an embedding table that fits executor page
# cache and one that thrashes it.  Scoring on dequantized vectors
# loses < 1% cosine accuracy at 64 dims (recall floor pinned in
# tests/test_similarity.py).
# ---------------------------------------------------------------------------
def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, scale, qvec): symmetric per-vector int8-range quantization
    q_i = round(v_i * 127 / max|v|), entirely codegen (higher-order
    functions, no Python).  A zero vector quantizes to scale 0 and all
    zeros.  Dequantize with q_i * scale / 127 (see dequantize())."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    qvec = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.round(x * 127.0 / scale).cast("int"))
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        qvec.alias("qvec"),
    )


def dequantize(qvec, scale):
    """Column expression: int8-range codes back to doubles."""
    return F.transform(qvec, lambda q: q.cast("double") * scale / F.lit(127.0))


def quantized_brute_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Exact-shape brute-force cosine top-k over QUANTIZED vectors:
    same plan as brute_force_topk (broadcast query side, codegen
    scoring, window top-k) but the corpus side scores dequantized
    int8 codes — the accuracy/throughput tradeoff a production ANN
    serves from.  Used by the recall test; returns
    (query_id, neighbor_id, rank, score)."""
    qc = quantize_embeddings(fan_out(corpus), id_col, vec_col)
    c = qc.select(
        F.col(id_col).alias("neighbor_id"),
        dequantize(F.col("qvec"), F.col("scale")).alias("cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivf_quantized_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       n_cells: int = 16, n_probe: int = 4,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 42, train_cap: int = 100_000,
                       centroids: list | None = None) -> DataFrame:
    """IVF ANN whose posting lists store INT8 CODES — the composition
    of quantize_embeddings and ivf_topk (VERDICT r5 item 5), i.e. the
    actual 10^12-row serving shape: the index artifact per vector is
    (cell:int, scale:double, 64 int8 codes) ~ 70 bytes instead of a
    256-byte float32 vector, so posting lists for the whole corpus are
    4x more likely to sit in executor page cache, and the probe join
    moves 4x fewer bytes through the shuffle.

    Scoring runs on the RAW CODES: cosine is invariant under the
    per-vector positive scale (cos(q, s*c) == cos(q, c) for s > 0,
    and the s == 0 vector is all-zero codes either way), so the
    dequantize chain never has to be evaluated in the scoring
    expression at all — measured ~20% faster end-to-end at sf0.1 with
    byte-identical output to scoring on dequantized vectors (the
    round-6 score absorbs the sub-ulp float-association difference).
    Cell assignment DOES use the dequantized codes (Euclidean d2 is
    not scale-invariant, and the posting lists must be rebuildable
    from the stored artifact alone — codes + scale — never from the
    float vectors they replaced).

    With ``n_probe == n_cells`` every cell is probed and the result
    equals quantized_brute_topk exactly (the oracle-checkable
    configuration); at production probes the measured recall floor vs
    the float exact path is pinned in tests/test_similarity.py and
    scripts/ann_recall.py."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, n_cells=n_cells, seed=seed,
                                      train_cap=train_cap, vec_col=vec_col)
    if len(centroids) != n_cells:
        raise ValueError(f"centroids has {len(centroids)} cells, "
                         f"expected n_cells={n_cells}")
    # fan_out BEFORE quantize: the quantize/dequantize higher-order
    # chains are the heavy narrow stage here, and _ivf_search's own
    # fan_out sits ABOVE this projection, so on a single-file scan the
    # whole chain would run on one core below the exchange (measured:
    # this ordering is most of ann_ivf_quantized's 8.4s -> 1.7s
    # round-8 win at sf1.0; no-op on multi-split scans)
    qc = quantize_embeddings(fan_out(corpus), id_col, vec_col)
    c = qc.select(
        F.col(id_col).alias("neighbor_id"),
        dequantize(F.col("qvec"), F.col("scale")).alias("cvec"),
        F.col("qvec").alias("svec"),
    )
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    return _ivf_search(spark, c, q, centroids, n_probe, k,
                       score_col="svec")
