"""k-core peeling — maximal subgraph with minimum (undirected) degree >= k.

Not a reference notebook algorithm, but the standard link-graph companion to
triangle counting / Louvain (GraphBLAS formulation: iterate ``select`` on a
degree vector until fixpoint — the same reduce_rowwise + select primitives
SURVEY §2.1 maps).  Semantics: repeatedly delete every vertex whose degree
in the CURRENT subgraph is < k; the fixpoint is the k-core, independent of
deletion order (peeling is monotone, so the fixpoint is unique and any
extra rounds past convergence are identity — which is what lets a
fixed-unroll SQL oracle check a run-to-convergence Spark loop).

Spark shape: the iterated state is the SURVIVING EDGE relation itself —
each round computes degrees on the current subgraph (one groupBy with
map-side partial aggregation), keeps vertices with count >= k, and
semi-joins the current edges to the survivors on both endpoints
(localCheckpoint to cut lineage).  Convergence = edge count unchanged
(no edge removed ⇔ no vertex removed ⇔ degrees stable).

At 100 TB the plan holds: no per-vertex arrays are built (pure edge-form
joins), the moving state is monotonically SHRINKING (round t only ever
touches the subgraph that survived round t-1 — never the original O(E)
relation again), and power-law hubs are just heavy groupBy keys handled
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
    cur = materialize(sym)
    prev_edges = cur.count()

    rounds = 0
    with loop_shuffle_width(edges.sparkSession, max(prev_edges, 1)):
        for _ in range(max_rounds):
            alive = (
                cur.groupBy("s")
                .agg(F.count("*").alias("kdeg"))
                .filter(F.col("kdeg") >= k)
            )
            ids = alive.select("s")
            nxt = materialize(
                cur.join(ids, "s").join(ids.withColumnRenamed("s", "d"), "d")
            )
            n_edges = nxt.count()
            rounds += 1
            if n_edges == prev_edges:
                # fixpoint: nothing peeled, so alive's degrees are final
                out = materialize(alive)  # pin before dropping cur's blocks
                cur.unpersist()
                nxt.unpersist()
                return out.select(F.col("s").alias("id"), "kdeg"), rounds
            cur.unpersist()
            cur = nxt
            prev_edges = n_edges
    # max_rounds exhausted without a proven fixpoint: report current degrees
    out = materialize(
        cur.groupBy("s").agg(F.count("*").alias("kdeg")).filter(F.col("kdeg") >= k)
    )
    cur.unpersist()
    return out.select(F.col("s").alias("id"), "kdeg"), rounds
