"""Deterministic sampling operators for training-data curation.

A 100 TB corpus is never trained on whole: pipelines cut per-source /
per-language quotas, and the cut must be REPRODUCIBLE (same corpus in,
same sample out, independent of partitioning, cluster size, or execution
order).  Random samplers (``df.sample``, reservoir) give none of that, so
both operators here order by a cryptographic hash of the row key — a
fixed pseudo-random permutation of the stratum.

Scale shape: one hash-partitioned window per stratum (strata are the
natural partition key; a window per stratum parallelizes across
executors), or for global cuts a TakeOrdered top-k (distributed, no
single-task global sort).  Skewed strata are bounded by the quota n —
the window only ever RANKS, rows past rank n are dropped before any
further shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(key_col: str):
    # md5 of the decimal string key: identical bytes in any engine, so the
    # sample is reproducible outside Spark too (the DuckDB oracle replays it)
    return F.md5(F.col(key_col).cast("string"))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Keep the first ``n_per_stratum`` rows of each stratum under the
    md5(key) pseudo-random order (ties broken by the key itself, so the
    result is a pure function of the data).  Returns the sampled rows
    plus their 1-based ``sample_rank`` inside the stratum."""
    w = Window.partitionBy(stratum_col).orderBy(_hash_order(key_col),
                                                F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def deterministic_sample(df: DataFrame, key_col: str, n: int) -> DataFrame:
    """Global deterministic pseudo-random sample of ``n`` rows: the n
    smallest md5(key) values.  Plans as a distributed TakeOrdered (per-
    partition top-n, then merge) — no global sort, no single-task stage."""
    return (
        df.orderBy(_hash_order(key_col), F.col(key_col))
        .limit(n)
    )


# affine-mod-prime unit hash, the house deterministic-priority pattern
# (walks.py neighbor rank, mis.py priorities): exact integer arithmetic in
# both engines, then ONE multiply + ONE divide on doubles — each IEEE
# exactly-rounded, so the derived priorities are bit-identical in Spark and
# DuckDB (no transcendental in the path, unlike the classic exp-key A-ES
# formulation).
_P1 = 1000003
_MOD = 1000000007


def _unit_hash(key_col: str, salt: int):
    """Deterministic u(key) in (0, 1] from TWO affine rounds mod M:
    h1 = (key*P + salt) mod M;  h2 = (h1*P + 99991) mod M;  u = (h2+1)/M.
    One round is not enough — for keys small relative to M/P the affine
    value never wraps and u is proportional to the key (systematically
    tiny); the second multiply wraps the modulus hundreds of times even
    for single-digit keys.  All intermediates < 1e15 << 2^63: exact in
    BIGINT on both engines."""
    h1 = (F.col(key_col) * _P1 + F.lit(salt)) % _MOD
    h2 = (h1 * _P1 + F.lit(99991)) % _MOD
    return (h2 + 1).cast("double") / F.lit(float(_MOD))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: int = 17,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows —
    priority sampling (Duffield-Lund-Thorup): keep the n rows with the
    largest priority q = w / u, u ~ U(0,1] derived from the key hash.
    Heavier rows win proportionally more often; a row with weight 0 is
    never taken before any positively-weighted row.

    Plans as a distributed TakeOrdered (per-partition top-n, merge on the
    driver-side heap) — no global sort, no single-task exchange, and the
    scan only carries (key, weight) width until the final row fetch.
    """
    pri = (F.col(weight_col).cast("double") / _unit_hash(key_col, salt)).alias("_pri")
    return (
        df.withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(key_col))
        .limit(n)
        .drop("_pri")
    )


def rebalance_sources(
    df: DataFrame,
    source_col: str,
    key_col: str,
    keep_fractions: dict,
    default_fraction: float = 1.0,
    salt: int = 29,
) -> DataFrame:
    """Static source-mix rebalance: independently keep each row of source
    ``s`` with probability ``keep_fractions[s]`` — the deterministic
    Bernoulli thinning used to hit per-domain token budgets (the static
    form of DoReMi-style mixture reweighting).  u(key) ∈ (0,1] so a
    fraction of 1.0 keeps everything and 0.0 drops everything.

    Pure map-side filter: ZERO shuffles, the predicate is pushed into the
    scan stage, and the decision is a function of (key, source) alone —
    reproducible across partitionings, cluster sizes, and engines.
    """
    frac = F.lit(float(default_fraction))
    for s, f in sorted(keep_fractions.items()):
        frac = F.when(F.col(source_col) == s, F.lit(float(f))).otherwise(frac)
    return df.filter(_unit_hash(key_col, salt) <= frac)


def dsir_weights(
    docs: DataFrame,
    target_col: str,
    n_buckets: int = 8192,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw
    document by how target-like its hashed n-gram distribution is —

        log w(x) = Σ_{g ∈ grams(x)} [ ln p̂_target(h(g)) − ln p̂_raw(h(g)) ]

    with unigram + adjacent-bigram word features hashed into ``n_buckets``
    and Laplace-``smoothing`` bucket estimates (the paper's bag-of-hashed-
    ngrams model).  ``target_col`` is a boolean column marking the target
    (quality-exemplar) subset; raw = ALL rows.  Downstream, sampling
    ∝ exp(log w) yields the importance-resampled corpus.

    Determinism contract: buckets are md5-derived (identical in any
    engine, the spectral-digest pattern); each doc's log-weight sums
    nano-quantized per-gram terms (BIGINT, order-independent — the NMI
    / k-means discipline), rounded 1e-6 on output.

    Scale shape: the bucket log-ratio table is ≤ n_buckets rows and
    BROADCAST; grams are an inline explode (never persisted); the only
    O(corpus) exchanges are the two bucket-count partial aggregations
    and the final doc-keyed partial-agg sum.  Nothing vocabulary- or
    corpus-sized reaches the driver.

    Returns (doc_id, is_target, n_grams, log_weight) for every document.
    """
    from graph_python_spark.functions.digest import md5_bucket

    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    grams = F.concat(
        words,                                                 # unigrams
        F.when(F.size(words) >= 2,
               F.transform(F.slice(words, 1, F.size(words) - 1),
                           (lambda w, i: F.concat_ws(
                               " ", w, F.element_at(words, i + 2)))))
        .otherwise(F.array()),                                 # bigrams
    )
    g = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(target_col).cast("boolean").alias("_t"),
                    F.explode_outer(grams).alias("_g"))
        .withColumn(
            "_h",
            F.when(F.col("_g").isNotNull(),
                   md5_bucket(F.col("_g"), n_buckets)))
    )
    counts = (
        g.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_cr"),
             F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_ct"))
    )
    totals = counts.agg(F.sum("_cr").alias("_nr"), F.sum("_ct").alias("_nt"))
    lam = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "_h",
            (F.log((F.col("_ct") + F.lit(smoothing))
                   / (F.col("_nt") + F.lit(smoothing * n_buckets)))
             - F.log((F.col("_cr") + F.lit(smoothing))
                     / (F.col("_nr") + F.lit(smoothing * n_buckets))))
            .alias("_lam"))
    )
    return (
        g.join(F.broadcast(lam), "_h", "left")
        .groupBy("doc_id")
        .agg(F.first("_t").alias("is_target"),
             F.count(F.col("_h")).alias("n_grams"),
             F.round(
                 F.sum(F.round(F.coalesce(F.col("_lam"), F.lit(0.0)) * 1e9,
                               0).cast("long")) / F.lit(1e9), 6)
             .alias("log_weight"))
    )
