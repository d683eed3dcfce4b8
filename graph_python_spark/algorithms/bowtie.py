"""Web bow-tie decomposition (Broder et al., WWW 2000).

Classifies every vertex of a directed graph into the six classic
link-graph regions relative to the largest strongly connected component:

  * ``CORE``         — the largest SCC (ties broken by smallest member id).
  * ``IN``           — reaches CORE, not in it.
  * ``OUT``          — reachable from CORE, not in it.
  * ``TUBE``         — on an IN -> OUT path that bypasses CORE
                       (reachable from IN AND reaches OUT).
  * ``TENDRIL``      — hangs off IN (reachable from IN) or into OUT
                       (reaches OUT), but not both.
  * ``DISCONNECTED`` — none of the above.

Reference parity: python-graphblas has no bow-tie helper, but its users
compose exactly this from BFS levels + SCC (reference
``graphblas/core/matrix.py`` mxv traversals; see also
``notebooks/Louvain.ipynb``-style composition); the decomposition itself
is the standard structure report for web-scale link graphs, which is this
engine's tier.

Plan shape: ONE SCC run (forward-backward coloring,
``algorithms/scc.py``) + FOUR multi-source reachability sweeps, each a
frontier BFS whose per-round exchange is sized by the frontier, not the
graph (``new = edges ⋈ frontier`` then anti-join against the reached
set).  The final labeling is five hash left-joins on the vertex key + one
CASE — no closure is ever materialized (the DuckDB oracle builds the
recursive closure instead; fine at sf0.01, impossible at 100 TB).

Scale notes (100 TB): frontier rounds are bounded by the directed
diameter of each region; on real web graphs the giant CORE makes the
sweeps converge in tens of rounds.  All four sweeps and the label joins
shuffle on the vertex id only, so pre-partitioning edges by ``s`` is
reused across rounds; the reached set grows monotonically and is the only
cached state (O(V) ids, no payload).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.algorithms.scc import strongly_connected_components
from graph_python_spark.plans.iterate import (iterative, loop_shuffle_width,
                                              materialize)


def reach_from(edges: DataFrame, seeds: DataFrame,
               max_rounds: int = 100) -> DataFrame:
    """Vertices reachable from ``seeds`` (id) along ``edges`` (s, d),
    seeds included.  Frontier BFS: each round ships only the frontier
    through the edge join and anti-joins the cumulative reached set, so
    the exchange is O(frontier-adjacent), not O(V).  Returns (id)."""
    reached = materialize(seeds.select("id").distinct())
    frontier = reached
    for _ in range(max_rounds):
        nxt = materialize(
            edges.join(frontier.withColumnRenamed("id", "s"), "s")
            .select(F.col("d").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        new_reached = materialize(reached.unionByName(nxt))
        reached.unpersist()
        if frontier is not reached:
            frontier.unpersist()
        reached, frontier = new_reached, nxt
    return reached


@iterative
def bowtie_decomposition(
    edges: DataFrame,
    max_rounds: int = 100,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Bow-tie region per vertex of the directed graph under ``edges``
    (long columns i -> j; self-loops and duplicates ignored).  Returns
    (id long, region string) with region in {CORE, IN, OUT, TUBE,
    TENDRIL, DISCONNECTED}; deterministic (largest SCC, ties by min id).
    """
    spark = edges.sparkSession
    eb = (edges.select(F.col("i").alias("s"), F.col("j").alias("d"))
          .filter(F.col("s") != F.col("d"))
          .dropDuplicates(["s", "d"]))
    if partitions is not None:
        eb = eb.repartition(partitions, "s")
    eb = materialize(eb)
    rev = materialize(eb.select(F.col("d").alias("s"), F.col("s").alias("d")))
    verts = materialize(
        eb.select(F.col("s").alias("id"))
        .unionByName(eb.select(F.col("d").alias("id")))
        .distinct()
    )
    n_verts = verts.count()

    labels, _rounds = strongly_connected_components(
        eb.select(F.col("s").alias("i"), F.col("d").alias("j")),
        max_label_rounds=max_rounds,
    )
    # largest SCC, ties by smallest component id (= smallest member id,
    # since the SCC label is its minimum vertex)
    top = (labels.groupBy("component").count()
           .orderBy(F.desc("count"), F.asc("component"))
           .select("component").first())
    core = materialize(
        labels.filter(F.col("component") == top["component"]).select("id"))
    labels.unpersist()

    with loop_shuffle_width(spark, max(n_verts, 1)):
        fwd = reach_from(eb, core, max_rounds)     # CORE ∪ OUT ∪ …
        bwd = reach_from(rev, core, max_rounds)    # CORE ∪ IN ∪ …
        in_ = materialize(bwd.join(core, "id", "left_anti"))
        out = materialize(fwd.join(core, "id", "left_anti"))
        fin = reach_from(eb, in_, max_rounds)      # reachable from IN
        bout = reach_from(rev, out, max_rounds)    # reaches OUT

    def flag(df: DataFrame, name: str) -> DataFrame:
        return df.select("id", F.lit(True).alias(name))

    region = (
        F.when(F.col("_core"), "CORE")
        .when(F.col("_in"), "IN")
        .when(F.col("_out"), "OUT")
        .when(F.col("_fin") & F.col("_bout"), "TUBE")
        .when(F.col("_fin") | F.col("_bout"), "TENDRIL")
        .otherwise("DISCONNECTED")
    )
    res = (
        verts
        .join(flag(core, "_core"), "id", "left_outer")
        .join(flag(in_, "_in"), "id", "left_outer")
        .join(flag(out, "_out"), "id", "left_outer")
        .join(flag(fin, "_fin"), "id", "left_outer")
        .join(flag(bout, "_bout"), "id", "left_outer")
        .na.fill(False, ["_core", "_in", "_out", "_fin", "_bout"])
        .select("id", region.alias("region"))
    )
    res = materialize(res)
    for df in (eb, rev, verts, core, fwd, bwd, in_, out, fin, bout):
        try:
            df.unpersist()
        except Exception:
            pass
    return res
