"""Deterministic mergeable sketches for pipeline aggregates.

Spark's ``approx_count_distinct`` (HyperLogLog++) is fast but its estimate
depends on internal hashing and is not reproducible across engines.  The
k-minimum-values (KMV) sketch over md5 digests — the same construction the
ANF reachability loop uses (``algorithms/anf.py``) — is a deterministic
function of the input SET: identical in any engine, under any
partitioning, and exactly oracle-checkable, while still mergeable across
shards (union = keep the k smallest).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_kmv(df: DataFrame, keys: Sequence[str], col: str,
                        k: int = 64) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT ``col``) via a KMV sketch.

    estimate = (k−1)/U(kth smallest digest) when the group holds ≥ k
    distinct values (U = first-12-hex-chars of the digest as a unit
    fraction); groups below k are counted exactly.  Standard error
    ≈ 1/√(k−2).

    Plan: ONE distinct pass over (keys, digest) with map-side partials,
    then a partition-parallel per-group window keeps only the k smallest
    digests before the closing aggregate — per-group state is bounded at
    k rows regardless of group size, and the window never sees more than
    the distinct relation (no global sort, no collect).

    Returns (*keys, n_kept, est_distinct).
    """
    keys = list(keys)
    # COUNT(DISTINCT col) ignores NULLs; dropping them here also keeps the
    # window's NULL placement out of the sketch (Spark sorts NULLS FIRST,
    # DuckDB NULLS LAST — a NULL digest would silently displace a real one
    # on exactly one engine)
    dig = (
        df.filter(F.col(col).isNotNull())
        .select(*keys, F.md5(F.col(col).cast("string")).alias("_dig"))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("_dig")
    topk = (
        dig.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    n_kept = F.count("*").cast("long")
    kth_frac = (
        F.conv(F.substring(F.max("_dig"), 1, 12), 16, 10).cast("double")
        / F.lit(float(16 ** 12)))
    return (
        topk.groupBy(*keys)
        .agg(
            n_kept.alias("n_kept"),
            F.round(
                F.when(n_kept < k, n_kept.cast("double"))
                .otherwise(F.lit(float(k - 1)) / kth_frac), 6)
            .alias("est_distinct"),
        )
    )
