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


def heavy_hitters(docs: DataFrame, k: int = 50, capacity: int = 4096,
                  text_col: str = "text") -> DataFrame:
    """EXACT corpus heavy hitters without a full-vocabulary shuffle:
    the top-``k`` tokens among those with count · capacity > N
    (N = total token occurrences), found by a per-partition Misra–Gries
    pruning pass followed by an exact recount of the survivors only.

    Why not one groupBy: at 100 TB the token-keyed exchange carries the
    ENTIRE vocabulary (billions of keys, Zipf tail) to find the handful
    of heads.  The MG summary (Misra & Gries '82; mergeable-summaries
    form of Agarwal et al., PODS'12) bounds each partition's output at
    ``capacity`` rows with the guarantee that every token whose global
    count exceeds N/(capacity+1) survives in at least one partition —
    a superset of the > N/capacity report set.  The exact recount then
    touches only survivor occurrences (map-side partial agg over
    ≤ capacity·P keys), so both exchanges are heavy-hitter-sized, not
    vocabulary-sized.

    Determinism: the MG pass only PRUNES — the reported rows are exact
    counts filtered by the integer predicate count·capacity > N and
    ranked (count desc, token asc), a pure function of the corpus no
    matter how partitions split (the DuckDB oracle is a plain
    GROUP BY + HAVING).  The per-batch summary fold is pandas/NumPy
    vectorized (value_counts + bulk decrement), never per-row Python.

    Returns (token, n, share) — at most ``k`` rows, share = round(n/N, 6).
    """
    from graph_python_spark.pipeline.text import tokens_col

    toks = docs.select(F.explode(tokens_col(text_col)).alias("token"))
    cap = int(capacity)

    def _mg(batches):
        import pandas as pd
        s = None
        for pdf in batches:
            vc = pdf["token"].value_counts()
            s = vc if s is None else s.add(vc, fill_value=0)
            if len(s) > cap:
                # bulk Misra-Gries decrement: subtract the (cap+1)-th
                # largest count from everything, drop the non-positive
                thr = s.nlargest(cap + 1).iloc[-1]
                s = s[s > thr] - thr
        if s is not None and len(s):
            yield pd.DataFrame({"token": s.index.astype(str)})

    survivors = toks.mapInPandas(_mg, "token string").distinct()
    counts = (
        toks.join(survivors.hint("broadcast"), "token", "left_semi")
        .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(cap) > F.col("_n"))
        .select("token", "n",
                F.round(F.col("n").cast("double") / F.col("_n"), 6)
                .alias("share"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )
