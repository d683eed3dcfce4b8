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
``algorithms/scc.py``) + TWO tagged multi-source reachability loops —
the forward-from-CORE / backward-from-CORE sweeps advance together in
one (tag, id)-keyed frontier over a (tag, s, d)-keyed union of the edge
table and its reverse, and likewise forward-from-IN / backward-from-OUT,
so the driver pays max(diameters) rounds per loop instead of the sum.
Each round's exchange is frontier-sized (``tagged edges ⋈ frontier``
then anti-join against the reached set, held as a lazy union of pinned
per-round parts — never re-checkpointed, which also sidesteps the
Spark 4 union-constraint-rewrite bug documented in plans/iterate.py).
The final labeling is five hash left-joins on the vertex key + one CASE
— no closure is ever materialized (the DuckDB oracle builds the
recursive closure instead; fine at sf0.01, impossible at 100 TB).

Scale notes (100 TB): frontier rounds are bounded by the directed
diameter of each region; on real web graphs the giant CORE makes the
sweeps converge in tens of rounds.  All sweeps and the label joins
shuffle on the vertex key only; the reached set grows monotonically and
its pinned parts total O(V) ids, no payload.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.algorithms.scc import strongly_connected_components
from graph_python_spark.plans.iterate import (iterative, loop_shuffle_width,
                                              materialize)


def _reach_tagged(tagged_edges: DataFrame, tagged_seeds: DataFrame,
                  max_rounds: int = 100) -> DataFrame:
    """Per-tag reachability: vertices reachable from that tag's seeds
    along that tag's edges, seeds included.  ``tagged_edges``:
    (tag, s, d); ``tagged_seeds``: (tag, id).  All tags advance in ONE
    frontier relation, so k sweeps cost max (not sum) of their round
    counts.  Returns (tag, id) as a lazy union of pinned per-round
    parts."""
    parts = [materialize(tagged_seeds.select("tag", "id").distinct())]
    frontier = parts[0]
    for _ in range(max_rounds):
        reached = reduce(lambda a, b: a.unionByName(b), parts)
        nxt = materialize(
            tagged_edges.join(frontier.withColumnRenamed("id", "s"),
                              ["tag", "s"])
            .select("tag", F.col("d").alias("id"))
            .distinct()
            .join(reached, ["tag", "id"], "left_anti")
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        parts.append(nxt)
        frontier = nxt
    return reduce(lambda a, b: a.unionByName(b), parts)


def reach_from(edges: DataFrame, seeds: DataFrame,
               max_rounds: int = 100) -> DataFrame:
    """Vertices reachable from ``seeds`` (id) along ``edges`` (s, d),
    seeds included.  Frontier BFS: each round ships only the frontier
    through the edge join; the exchange is O(frontier-adjacent), not
    O(V).  Returns (id)."""
    out = _reach_tagged(
        edges.select(F.lit("f").alias("tag"), "s", "d"),
        seeds.select(F.lit("f").alias("tag"), "id"),
        max_rounds,
    )
    return out.select("id")


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
    # one (tag, s, d) relation: 'f' = forward edges, 'b' = reversed —
    # pinned (tag, s)-hash-partitioned so every sweep round's
    # tagged ⋈ frontier join reuses the partitioning (only the
    # frontier-sized side exchanges per round)
    tagged = materialize(
        eb.select(F.lit("f").alias("tag"), "s", "d")
        .unionByName(eb.select(F.lit("b").alias("tag"),
                               F.col("d").alias("s"), F.col("s").alias("d")))
        .repartition("tag", "s")
    )
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

    with loop_shuffle_width(spark, max(n_verts, 1)):
        # sweep pair 1: forward + backward from CORE, one tagged loop
        r1 = _reach_tagged(
            tagged,
            core.select(F.lit("f").alias("tag"), "id")
            .unionByName(core.select(F.lit("b").alias("tag"), "id")),
            max_rounds,
        )
        fwd = r1.filter(F.col("tag") == "f").select("id")
        bwd = r1.filter(F.col("tag") == "b").select("id")
        in_ = materialize(bwd.join(core, "id", "left_anti"))
        out = materialize(fwd.join(core, "id", "left_anti"))
        # sweep pair 2: forward from IN + backward from OUT, one loop
        r2 = _reach_tagged(
            tagged,
            in_.select(F.lit("f").alias("tag"), "id")
            .unionByName(out.select(F.lit("b").alias("tag"), "id")),
            max_rounds,
        )
        fin = r2.filter(F.col("tag") == "f").select("id")
        bout = r2.filter(F.col("tag") == "b").select("id")

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
    for df in (eb, tagged, verts, core, in_, out):
        try:
            df.unpersist()
        except Exception:
            pass
    return res
