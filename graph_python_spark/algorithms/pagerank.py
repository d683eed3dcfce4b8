"""PageRank — iterated plus_second SpMV, LAGraph `pagerank_3f` semantics.

Reference recipe (``/root/reference/notebooks/Pagerank Demo.ipynb`` cell 9):

    teleport = (1 - damping) / n ;  r = 1/n (dense)
    d = d_out / damping                      # only vertices with out-edges
    loop until rdiff <= tol:
        w = t ⊘ d                            # ewise_mult ⇒ INTERSECTION:
                                             #   dangling vertices drop out,
                                             #   they contribute teleport only
        r = teleport  (dense)
        r += Aᵀ·w  over plus_second          # sum of w over in-neighbors
        rdiff = sum |t - r|                  # L1 convergence

Spark shape (one irreducible shuffle per iteration):
  * edges are hash-partitioned by src ONCE and cached — every per-iteration
    join on src reuses that partitioning (no re-shuffle of the big side);
  * ranks (n rows ≪ nnz) are the small join side — AQE broadcasts them when
    they fit;
  * contributions groupBy(dst) is the per-iteration shuffle, with map-side
    partial aggregation;
  * each iteration ends in localCheckpoint (lineage truncation) or a durable
    IterationState checkpoint for resumability.

At 1000-executor / 100 TB scale the same plan holds: the edge table stays
partitioned by src across iterations, only the O(V) rank vector moves, and
power-law dst skew is handled by the salted two-stage combine in
``operators/blocks.py`` (⊕ associativity makes partial merges exact).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.plans.iterate import IterationState, materialize


def _prepare(edges: DataFrame, vertices: Optional[DataFrame], partitions: Optional[int]):
    """Binarize the graph, derive the dense vertex set and out-degrees."""
    e = edges.select(F.col("i"), F.col("j")).distinct()  # A = one(A): binary graph
    if partitions:
        e = e.repartition(partitions, "i")
    e = e.cache()
    if vertices is None:
        vertices = (
            e.select(F.col("i").alias("id"))
            .unionByName(e.select(F.col("j").alias("id")))
            .distinct()
        )
    vertices = vertices.select("id").cache()
    n = vertices.count()
    d_out = e.groupBy("i").agg(F.count("*").cast("double").alias("d"))
    return e, vertices, n, d_out


def pagerank(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    itermax: int = 100,
    partitions: Optional[int] = None,
    checkpoint: Optional[IterationState] = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, int, list[float]]:
    """Run to L1 convergence. Returns (scores(id, score), iters, rdiff trace).

    ``edges``: DataFrame with long columns i (src), j (dst); duplicates OK
    (binarized).  ``checkpoint``: optional durable IterationState — a killed
    run resumes from the last saved iteration with identical results.
    """
    e, vertices, n, d_out = _prepare(edges, vertices, partitions)
    if n == 0:
        empty = edges.sparkSession.createDataFrame([], "id long, score double")
        return empty, 0, []
    teleport = (1.0 - damping) / n

    # d = d_out / damping, kept as 1/d to turn the per-iteration ⊘ into a ⊗
    inv_d = d_out.select("i", (F.lit(damping) / F.col("d")).alias("inv_d")).cache()
    inv_d.count()

    start_iter = 0
    rdiffs: list[float] = []
    r = vertices.select(F.col("id").alias("i"), F.lit(1.0 / n).alias("v"))
    if checkpoint is not None:
        restored = checkpoint.restore()
        if restored is not None:
            start_iter, states, metrics = restored
            r = states["ranks"]
            rdiffs = list(metrics.get("rdiffs", []))
            if rdiffs and rdiffs[-1] <= tol:
                return r.select(F.col("i").alias("id"), F.col("v").alias("score")), start_iter, rdiffs
    r = materialize(r)

    iters = start_iter
    for k in range(start_iter, itermax):
        t = r
        # w = t ⊘ d : inner join == ewise_mult intersection (dangling drop out)
        w = t.join(inv_d, "i").select("i", (F.col("v") * F.col("inv_d")).alias("w"))
        # contrib[j] = Σ_{i→j} w[i]  (Aᵀ·w over plus_second)
        contrib = (
            e.join(w, "i")
            .groupBy(F.col("j").alias("i"))
            .agg(F.sum("w").alias("c"))
        )
        # r = teleport + contrib, dense over all n vertices
        new_r = (
            vertices.select(F.col("id").alias("i"))
            .join(contrib, "i", "left_outer")
            .select("i", (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("v"))
        )
        new_r = materialize(new_r)
        rdiff = (
            t.withColumnRenamed("v", "_t")
            .join(new_r, "i", "full_outer")
            .agg(F.sum(F.abs(F.coalesce(F.col("_t"), F.lit(0.0))
                             - F.coalesce(F.col("v"), F.lit(0.0)))).alias("d"))
            .first()["d"]
        )
        rdiffs.append(float(rdiff))
        r = new_r
        iters = k + 1
        if checkpoint is not None and iters % checkpoint_every == 0:
            checkpoint.save(iters, {"ranks": r}, {"rdiffs": rdiffs, "n": n})
        if rdiff <= tol:
            break

    return r.select(F.col("i").alias("id"), F.col("v").alias("score")), iters, rdiffs


def pagerank_fixed(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    damping: float = 0.85,
    iterations: int = 20,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Exactly ``iterations`` pagerank_3f steps, no convergence action —
    deterministic output used by the DuckDB-checked correctness queries."""
    e, vertices, n, d_out = _prepare(edges, vertices, partitions)
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, score double")
    teleport = (1.0 - damping) / n
    inv_d = d_out.select("i", (F.lit(damping) / F.col("d")).alias("inv_d"))

    r = vertices.select(F.col("id").alias("i"), F.lit(1.0 / n).alias("v"))
    for _ in range(iterations):
        w = r.join(inv_d, "i").select("i", (F.col("v") * F.col("inv_d")).alias("w"))
        contrib = e.join(w, "i").groupBy(F.col("j").alias("i")).agg(F.sum("w").alias("c"))
        r = (
            vertices.select(F.col("id").alias("i"))
            .join(contrib, "i", "left_outer")
            .select("i", (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("v"))
        )
        r = materialize(r)
    return r.select(F.col("i").alias("id"), F.col("v").alias("score"))
