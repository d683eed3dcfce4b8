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

Spark shape — the loop iterates on the SPARSE contribution vector only
(r is never materialized densely inside the loop):

    w_k      = (teleport + contrib_k) ⊙ inv_d     on inv_d's domain
    contrib' = Σ_{i→j} w_k[i]                     edges ⋈ w, groupBy(dst)

  * identical arithmetic to the dense recipe: r_k = teleport + contrib_k
    (vertices with no in-edges sit at teleport and, if dangling, never feed
    back); the dense r materializes once, after the loop;
  * edges are hash-partitioned by src ONCE and cached — the per-iteration
    join on src reuses that partitioning; only O(V) vectors move;
  * the one irreducible O(E) shuffle is the groupBy(dst) with map-side
    partial aggregation;
  * lineage is truncated by localCheckpoint every ``checkpoint_every``
    iterations (old state unpersisted), or durably via IterationState for
    the north-rule resume guarantee;
  * rdiff = Σ|contrib' - contrib| exactly (the dense teleport terms cancel).

At 1000-executor / 100 TB scale the plan holds: the edge table stays
partitioned by src across iterations, the rank vector is the only moving
state, and power-law dst skew is handled by the salted two-stage combine in
``operators/blocks.py`` (⊕ associativity makes partial merges exact).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.plans.iterate import IterationState


class _Pinned:
    """Rotating localCheckpoint holder: pin new state, unpersist the old."""

    def __init__(self):
        self.prev: Optional[DataFrame] = None

    def pin(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        if self.prev is not None:
            try:
                self.prev.unpersist()
            except Exception:
                pass
        self.prev = out
        return out


def _prepare(edges: DataFrame, vertices: Optional[DataFrame], partitions: Optional[int]):
    """Binarize the graph, derive the vertex set and inverse scaled degrees."""
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


def _contrib_loop(e, inv_d, teleport, r0, iterations, pinned, contrib=None,
                  rdiff_cb=None, tol=None):
    """Shared iteration body. contrib=None means start from dense r0=1/n."""
    iters_done = 0
    for k in range(iterations):
        if contrib is None:
            w = inv_d.select("i", (F.lit(r0) * F.col("inv_d")).alias("w"))
        else:
            w = (
                inv_d.join(contrib, "i", "left_outer")
                .select("i", ((F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0)))
                              * F.col("inv_d")).alias("w"))
            )
        new_contrib = (
            e.join(w, "i")
            .groupBy(F.col("j").alias("i"))
            .agg(F.sum("w").alias("c"))
        )
        if rdiff_cb is not None:
            new_contrib = pinned.pin(new_contrib)
            rdiff = rdiff_cb(contrib, new_contrib, k)
            contrib = new_contrib
            iters_done = k + 1
            if tol is not None and rdiff <= tol:
                break
        else:
            # fixed-iteration mode: truncate lineage only every few rounds
            if (k + 1) % 3 == 0 or k == iterations - 1:
                new_contrib = pinned.pin(new_contrib)
            contrib = new_contrib
            iters_done = k + 1
    return contrib, iters_done


def _finalize(vertices, contrib, teleport) -> DataFrame:
    return (
        vertices.select(F.col("id").alias("i"))
        .join(contrib, "i", "left_outer")
        .select(F.col("i").alias("id"),
                (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("score"))
    )


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
    inv_d = d_out.select("i", (F.lit(damping) / F.col("d")).alias("inv_d")).cache()
    inv_d.count()

    start_iter = 0
    rdiffs: list[float] = []
    contrib: Optional[DataFrame] = None
    if checkpoint is not None:
        restored = checkpoint.restore()
        if restored is not None:
            start_iter, states, metrics = restored
            contrib = states["contrib"]
            rdiffs = list(metrics.get("rdiffs", []))
            if rdiffs and rdiffs[-1] <= tol:
                return _finalize(vertices, contrib, teleport), start_iter, rdiffs

    pinned = _Pinned()

    def rdiff_cb(old_contrib, new_contrib, k):
        # Σ|r_new - r_old|: teleport cancels; vertices never receiving
        # contributions never change. First iteration diffs against r0=1/n
        # on contribution-receiving vertices, plus the unchanged remainder:
        # matches the dense recipe because r0 is uniform.
        if old_contrib is None:
            # |r1 - r0| = Σ_receiving |tel + c - 1/n| + (n - receiving)·|tel - 1/n|
            row = new_contrib.agg(
                F.sum(F.abs(F.lit(teleport) + F.col("c") - F.lit(1.0 / n))).alias("d"),
                F.count("*").alias("m"),
            ).first()
            rdiff = float(row["d"] or 0.0) + (n - row["m"]) * abs(teleport - 1.0 / n)
        else:
            row = (
                old_contrib.withColumnRenamed("c", "_co")
                .join(new_contrib, "i", "full_outer")
                .agg(F.sum(F.abs(F.coalesce(F.col("c"), F.lit(0.0))
                                 - F.coalesce(F.col("_co"), F.lit(0.0)))).alias("d"))
                .first()
            )
            rdiff = float(row["d"] or 0.0)
        rdiffs.append(rdiff)
        iters_now = start_iter + k + 1
        if checkpoint is not None and iters_now % checkpoint_every == 0:
            checkpoint.save(iters_now, {"contrib": new_contrib},
                            {"rdiffs": rdiffs, "n": n})
        return rdiff

    remaining = itermax - start_iter
    contrib, done = _contrib_loop(
        e, inv_d, teleport, 1.0 / n, remaining, pinned, contrib=contrib,
        rdiff_cb=rdiff_cb, tol=tol,
    )
    return _finalize(vertices, contrib, teleport), start_iter + done, rdiffs


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
    inv_d = d_out.select("i", (F.lit(damping) / F.col("d")).alias("inv_d")).cache()

    pinned = _Pinned()
    contrib, _ = _contrib_loop(e, inv_d, teleport, 1.0 / n, iterations, pinned)
    return _finalize(vertices, contrib, teleport)
