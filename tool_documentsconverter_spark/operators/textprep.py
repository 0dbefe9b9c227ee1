"""Training-data preparation operators: sliding-window chunking,
deterministic sampling, and fixed-budget sequence packing.

These are the steps between a curated corpus and a tokenizer/trainer:
long documents become overlapping context-window chunks, the corpus is
down-sampled reproducibly (overall or per stratum), and documents are
packed into fixed token-budget training sequences.  Everything is pure
Column expressions (codegen, no Python in the hot path) and every
random-looking choice is an md5 hash of row identity — deterministic,
cluster-size-independent, and replayable by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import TOKEN_SPLIT_RE


def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    stride: int = 96, id_col: str = "doc_id",
                    text_col: str = "text",
                    tokenizer: str = "whitespace",
                    merges=None) -> DataFrame:
    """Sliding-window chunking: each document becomes
    ceil((n_tokens - chunk_tokens) / stride) + 1 overlapping chunks of
    at most ``chunk_tokens`` whitespace tokens, starting every
    ``stride`` tokens (overlap = chunk_tokens - stride).  The final
    chunk is short rather than padded; every token appears in at least
    one chunk.

    Scale shape: tokenize-explode-slice is one narrow projection + one
    explode — no shuffle at all (chunk rows inherit the scan's
    partitioning), and the explode fan-out is bounded by
    n_tokens/stride per row.  Output: (id, chunk_idx, chunk_text,
    n_tokens) with chunk_idx dense from 0 per document in whitespace
    mode (ADVICE r7: in bpe mode a single word whose BPE cost exceeds
    chunk_tokens can leave index gaps — no word START lands in the
    intermediate windows — and punctuation-only documents yield one
    chunk with n_tokens=0; the density guarantee is scoped to
    whitespace mode).

    ``tokenizer='bpe'`` measures ``chunk_tokens``/``stride`` in
    fixed-vocab BPE tokens (``operators/bpe.py``) while boundaries
    still land on whitespace words (words are atomic): a word belongs
    to every chunk whose BPE window contains the word's START offset —
    the same belongs-where-it-starts rule `pack_sequences` uses — so a
    chunk's realized size can exceed the budget by at most its last
    word.  This mode costs one bounded per-document window (the
    per-word BPE cumsum) plus the per-(doc, chunk) rollup; empty
    documents yield no chunks.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError(
            "stride > chunk_tokens would skip tokens between chunks")
    if tokenizer == "bpe":
        from .bpe import DEFAULT_MERGES, bpe_token_count

        m = DEFAULT_MERGES if merges is None else merges
        words = df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")),
                        TOKEN_SPLIT_RE)
            ).alias("pos", "w"),
        ).where(F.col("w") != "")
        w_doc = Window.partitionBy(id_col).orderBy("pos")
        words = (
            words.withColumn("_c", bpe_token_count(F.col("w"), m))
            .withColumn(
                "_b", (F.sum("_c").over(w_doc) - F.col("_c")).cast("long"))
        )
        kmin = F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col("_b") - chunk_tokens) / stride) + 1)
        kmax = F.floor(F.col("_b") / stride)
        memb = words.select(
            id_col, "pos", "w", "_c",
            F.explode(F.sequence(kmin.cast("int"), kmax.cast("int")))
            .alias("chunk_idx"),
        )
        return (
            memb.groupBy(id_col, "chunk_idx")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "w"))),
                        lambda s: s["w"],
                    ),
                    " ",
                ).alias("chunk_text"),
                F.sum("_c").cast("int").alias("n_tokens"),
            )
            .select(id_col, "chunk_idx", "chunk_text", "n_tokens")
        )
    if tokenizer != "whitespace":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), TOKEN_SPLIT_RE)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
        + F.lit(1),
    )
    out = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
        .alias("chunk_idx"),
    )
    piece = F.slice(F.col("_toks"),
                    F.col("chunk_idx") * stride + 1, chunk_tokens)
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def hash_sample(df: DataFrame, fraction: float,
                id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sampling: keep a row iff the first 8
    hex digits of md5(salt || id) fall under ``fraction`` of the 32-bit
    space.  Unlike ``df.sample`` this is a pure filter — reproducible
    across runs, cluster sizes, AND engines (the oracle replays it),
    stable under re-partitioning, and different salts give independent
    draws (train/held-out splits)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt),
                                   F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return df.where(bucket < F.lit(int(fraction * 2**32)))


def stratified_sample(df: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum, chosen by md5 hash
    order of the row id — a deterministic reservoir that every engine
    reproduces (no RNG state, no seed-per-partition coupling).

    Scale shape: one hash-partitioned window per stratum.  A hot
    stratum serializes through one task the way any per-group top-k
    does; for percentage-style sampling of huge strata use
    :func:`hash_sample` (a shuffle-free filter) instead."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_sequences(df: DataFrame, budget_tokens: int = 1024,
                   part_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text",
                   tokenizer: str = "whitespace",
                   merges=None) -> DataFrame:
    """Concat-and-split sequence packing: within each ``part_col``
    shard, documents are laid out in ``id_col`` order as one token
    stream and cut into fixed ``budget_tokens`` windows; a document
    belongs to the bin where it STARTS (documents crossing a boundary
    spill into the next window, exactly like concat-then-chunk
    training prep).  Output: one row per document with its bin and
    intra-shard token offset — the trainer's shuffle-and-load manifest.

    ``tokenizer='bpe'`` measures the budget in fixed-vocab BPE tokens
    (``operators/bpe.py``; pass ``merges`` to override
    ``DEFAULT_MERGES``) — training budgets are BPE tokens, and
    whitespace counts are 2-4x off on code/CJK-adjacent text.  The
    packing algebra is unchanged: only the per-document cost column
    differs, still pure codegen.

    Scale shape: one window per shard (the cumulative sum); shards are
    independent token streams, so the parallelism unit is the shard —
    pack within natural shards (source, date, bucket), never globally
    (a global ORDER BY cumsum is one task at any cluster size).
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if tokenizer == "bpe":
        from .bpe import DEFAULT_MERGES, bpe_token_count

        toks = bpe_token_count(
            F.col(text_col), DEFAULT_MERGES if merges is None else merges)
    elif tokenizer == "whitespace":
        toks = F.size(
            F.split(F.coalesce(F.col(text_col), F.lit("")), TOKEN_SPLIT_RE))
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    w = Window.partitionBy(part_col).orderBy(id_col)
    cum = F.sum(toks).over(w)
    start = (cum - toks).cast("bigint")
    return df.select(
        part_col,
        id_col,
        toks.cast("bigint").alias("n_tokens"),
        start.alias("tok_offset"),
        F.floor(start / F.lit(budget_tokens)).cast("bigint").alias("bin"),
    )


def mixture_resample(df: DataFrame, domain_col: str = "source",
                     id_col: str = "doc_id",
                     budget_frac: float = 0.5,
                     weights: dict[str, float] | None = None) -> DataFrame:
    """Domain-mixture rebalancing (the data-mixing step of every
    large-scale training pipeline, DoReMi/Pile-style): resample the
    corpus to a target mixture over ``domain_col`` within a
    ``budget_frac`` token/document budget.  With ``weights=None`` the
    target is UNIFORM across observed domains — over-represented
    domains are down-sampled to p_keep = (budget * N / n_domains) /
    n_d, under-represented ones keep everything (p_keep caps at 1, so
    the realized budget can land under ``budget_frac`` — resampling
    never up-samples).  The keep decision is an md5 hash threshold on
    row identity: deterministic, replayable, and independent of
    partitioning — the same doc is kept on every run and every
    cluster size.

    Output per row: (id, domain, n_domain, p_keep, kept); filter
    kept=true for the resampled corpus.

    Scale shape: per-domain counts are ONE map-side-combinable
    groupBy collapsed to a tiny stats table, corpus totals come from
    a single-row aggregate cross-joined back (the bm25 corpus-stats
    idiom), and the stats rejoin onto the corpus is broadcast — the
    corpus itself is never shuffled; the probe is pure codegen.
    Explicit ``weights`` follow the same plan with a literal map
    lookup instead of the uniform 1/k."""
    from pyspark.sql.functions import broadcast

    stats = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_domain"))
    totals = stats.agg(
        F.sum("n_domain").alias("_n"), F.count(F.lit(1)).alias("_k"))
    if weights is None:
        target = (F.lit(float(budget_frac)) * F.col("_n")) / F.col("_k")
    else:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv])
        target = (F.lit(float(budget_frac)) * F.col("_n")
                  * F.coalesce(wmap[F.col(domain_col)], F.lit(0.0)))
    pk = (
        stats.crossJoin(broadcast(totals))
        .select(
            domain_col, "n_domain",
            F.least(F.lit(1.0), target / F.col("n_domain")).alias("_p"),
        )
    )
    hash_frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("double") / F.lit(4294967296.0)
    )
    return (
        df.join(broadcast(pk), on=domain_col)
        .select(
            F.col(id_col),
            F.col(domain_col).alias("domain"),
            "n_domain",
            F.round(F.col("_p"), 6).alias("p_keep"),
            (hash_frac < F.col("_p")).alias("kept"),
        )
    )
