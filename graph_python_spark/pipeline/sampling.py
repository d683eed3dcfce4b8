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
