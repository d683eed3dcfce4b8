"""k-core peeling — maximal subgraph with minimum (undirected) degree >= k.

Not a reference notebook algorithm, but the standard link-graph companion to
triangle counting / Louvain (GraphBLAS formulation: iterate ``select`` on a
degree vector until fixpoint — the same reduce_rowwise + select primitives
SURVEY §2.1 maps).  Semantics: repeatedly delete every vertex whose degree
in the CURRENT subgraph is < k; the fixpoint is the k-core, independent of
deletion order (peeling is monotone, so the fixpoint is unique and any
extra rounds past convergence are identity — which is what lets a
fixed-unroll SQL oracle check a run-to-convergence Spark loop).

Spark shape per round (all single-shuffle hash joins):
  * alive vertex set ⋈ symmetrized edge table on BOTH endpoints (two
    semi-joins; the alive side only shrinks, so Catalyst/AQE can broadcast
    it once it fits, and at cluster scale both joins hash-partition on the
    endpoint key);
  * groupBy(endpoint).count with map-side partial aggregation;
  * filter count >= k -> next alive set, localCheckpoint to cut lineage.

At 100 TB the plan holds: no per-vertex arrays are built (pure edge-form
joins), each round's shuffle is bounded by the surviving edge count which
is non-increasing, and power-law hubs are just heavy groupBy keys handled
by partial aggregation.  Rounds are O(peeling depth); for web-scale graphs
this is typically < 100 — each round is one wave of stages.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.plans.iterate import (iterative, loop_shuffle_width,
                                              materialize)


def _sym_distinct(edges: DataFrame) -> DataFrame:
    """Undirected simple edge set: symmetrize, drop self-loops, dedup."""
    fwd = edges.select(F.col("i").alias("s"), F.col("j").alias("d"))
    return (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


@iterative
def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    partitions: Optional[int] = None,
) -> tuple[DataFrame, int]:
    """Peel to the k-core of the undirected simple graph under ``edges``
    (long columns i, j; direction and duplicate edges ignored).

    Returns ``(core(id, kdeg), rounds)`` where ``kdeg`` is each surviving
    vertex's degree INSIDE the k-core and ``rounds`` is the number of
    peeling rounds executed (including the final no-change round that
    proves the fixpoint).
    """
    sym = _sym_distinct(edges)
    if partitions is not None:
        sym = sym.repartition(partitions, "s")
    sym = materialize(sym)

    deg = sym.groupBy("s").agg(F.count("*").alias("kdeg"))
    alive = materialize(deg.filter(F.col("kdeg") >= k))
    n_alive = alive.count()

    rounds = 1
    with loop_shuffle_width(edges.sparkSession, max(n_alive, 1)):
        for _ in range(1, max_rounds):
            ids = alive.select(F.col("s"))
            surviving = (
                sym.join(ids, "s")
                .join(ids.withColumnRenamed("s", "d"), "d")
            )
            new_alive = (
                surviving.groupBy("s")
                .agg(F.count("*").alias("kdeg"))
                .filter(F.col("kdeg") >= k)
            )
            new_alive = materialize(new_alive)
            alive.unpersist()
            n_new = new_alive.count()
            alive = new_alive
            rounds += 1
            if n_new == n_alive:
                break  # no vertex died this round -> degrees are stable too
            n_alive = n_new
    return alive.select(F.col("s").alias("id"), "kdeg"), rounds
