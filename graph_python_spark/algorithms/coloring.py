"""Distance-1 greedy graph coloring — deterministic Jones–Plassmann.

GraphBLAS formulation (same select/mask family as LAGraph MIS, SURVEY
§2.8): each round the vertices whose priority beats every UNCOLORED
neighbor's (mxv min over the residual graph + ewise compare) color
themselves with the smallest color absent from their already-colored
neighborhoods (the mex).  Winners of one round form an independent set,
so their mex computations never conflict; two adjacent vertices can
never win the same round, so the coloring is proper.

Deterministic variant: priority(v) = (v * 2654435761) mod 1000000007 —
the same Z_p bijection as ``algorithms/mis.py``, unique for any vertex
universe below p, so rounds are tie-free and the whole run is a pure
function of the graph (fixed-unroll SQL replay: rounds past the fixpoint
see an empty uncolored set and are identity).

Spark shape: the residual edge state (edges between uncolored vertices)
only ever shrinks and is the per-round aggregate input, partitioned once
on s; the FULL symmetric adjacency is pinned separately for the
mex neighbor-color lookup (join winners -> neighbors -> colors,
collect_set, then array_except(sequence(0, |set|), set) — all JVM-side).
Winner edges are removed with the small-delta plumbing from k-core/MIS
(InSet filter for small winner sets, anti-join otherwise).  Expected
rounds: O(log n) for hash priorities (Jones & Plassmann 1993).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.algorithms.mis import PRIO_MOD, PRIO_MULT
from graph_python_spark.plans.iterate import (iterative, loop_shuffle_width,
                                              materialize)

ROUND_SALT = 777767777


def round_prio(col, t: int):
    """Fresh priority each round: ((v + t*SALT) * MULT) mod P — a bijection
    on Z_p in v for every round t (unique priorities, no ties), but
    uncorrelated across rounds, which breaks the long monotone-priority
    chains that make fixed-priority Jones–Plassmann need O(chain) rounds:
    with per-round re-salting the expected round count is O(log n)
    (Luby-style analysis), measured 47 -> ~12 on the sf0.01 fixture.
    The round salt is reduced mod P driver-side and the pre-multiply
    ``mod P`` keeps every engine-side intermediate below 2^62 (int64
    bounds hold identically in Spark and DuckDB)."""
    salt = (t * ROUND_SALT) % PRIO_MOD
    return (((col + F.lit(salt)) % F.lit(PRIO_MOD))
            * F.lit(PRIO_MULT)) % F.lit(PRIO_MOD)


@iterative
def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 60,
    partitions: Optional[int] = None,
) -> tuple[DataFrame, int]:
    """Deterministic Jones–Plassmann coloring of the undirected simple
    graph under ``edges`` (long columns i, j; direction/duplicates
    ignored, self-loops dropped).

    Returns ``(colors(id, color), rounds)``: a proper coloring (adjacent
    vertices never share a color; colors are dense small ints starting at
    0) and the number of rounds executed (including the final round that
    empties the uncolored set).
    """
    spark = edges.sparkSession
    fwd = edges.select(F.col("i").alias("s"), F.col("j").alias("d"))
    sym = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"),
                                   F.col("s").alias("d")))
        .filter(F.col("s") != F.col("d"))
    )
    if partitions is not None:
        sym = sym.repartition(partitions, "s")
    else:
        sym = sym.repartition("s")
    full = materialize(sym.dropDuplicates(["s", "d"]))
    n_edges = full.count()
    cur = full  # residual: edges whose BOTH endpoints are uncolored
    unc = materialize(full.select(F.col("s").alias("id")).distinct())
    colors: Optional[DataFrame] = None
    inset_cap = 50_000

    rounds = 0
    with loop_shuffle_width(spark, max(n_edges, 1)):
        for _ in range(max_rounds):
            rounds += 1
            if unc.isEmpty():
                break
            # winners: priority below every uncolored neighbor's; vertices
            # with NO uncolored neighbor (residual-isolated) win by default
            nbr_min = cur.groupBy("s").agg(
                F.min(round_prio(F.col("d"), rounds)).alias("_m"))
            cand = materialize(
                unc.join(nbr_min.withColumnRenamed("s", "id"), "id",
                         "left_outer")
                .filter(F.col("_m").isNull()
                        | (round_prio(F.col("id"), rounds) < F.col("_m")))
                .select("id")
            )
            # mex over already-colored neighbors in the FULL graph
            if colors is not None:
                nc = (
                    cand.join(full.withColumnRenamed("s", "id"), "id")
                    .join(colors.select(F.col("id").alias("d"),
                                        F.col("color").alias("_nc")), "d")
                    .groupBy("id")
                    .agg(F.collect_set("_nc").alias("_cs"))
                )
                newc = (
                    cand.join(nc, "id", "left_outer")
                    .select(
                        "id",
                        F.when(F.col("_cs").isNull(), F.lit(0)).otherwise(
                            F.array_min(F.array_except(
                                F.sequence(F.lit(0), F.size("_cs")),
                                F.col("_cs")))
                        ).cast("long").alias("color"),
                    )
                )
                colors = materialize(colors.unionByName(newc))
            else:
                colors = materialize(
                    cand.select("id", F.lit(0).cast("long").alias("color")))
            # retire the winners from the uncolored set + residual edges
            unc_next = materialize(unc.join(cand, "id", "left_anti"))
            unc.unpersist()
            unc = unc_next
            probe = cand.limit(inset_cap + 1).collect()
            if len(probe) <= inset_cap:
                ids = [r[0] for r in probe]
                nxt = cur.filter(~F.col("s").isin(ids)
                                 & ~F.col("d").isin(ids))
            else:
                rm_s = cand.withColumnRenamed("id", "s")
                rm_d = cand.withColumnRenamed("id", "d")
                nxt = (cur.join(rm_s, "s", "left_anti")
                       .join(rm_d, "d", "left_anti"))
            nxt = materialize(nxt)
            if cur is not full:
                cur.unpersist()
            cur = nxt
            cand.unpersist()

    if colors is None:
        colors = spark.createDataFrame([], "id long, color long")
    out = materialize(colors.select("id", "color"))
    for df in (full, cur, unc, colors):
        try:
            df.unpersist()
        except Exception:
            pass
    return out, rounds
