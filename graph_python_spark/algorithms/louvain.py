"""Louvain community detection — synchronous modularity-greedy sweeps.

Reference: ``/root/reference/notebooks/Louvain.ipynb`` (AdjMatrix.
optimize_communities / louvain_levels / compute_modularity).  The reference
moves one node at a time (sequential greedy); that order-dependence cannot
be distributed, so this engine runs the standard SYNCHRONOUS variant: every
vertex evaluates the modularity gain of joining each neighboring community
against the CURRENT labeling and all vertices move simultaneously
(argmax ΔQ, ties to the smallest community id — fully deterministic, so a
fixed-sweep run is reproducible in any engine, including the DuckDB
correctness oracle).

Per sweep (one groupBy + three joins — all on vertex/community keys):

    k_v        = weighted degree                     (loop-invariant)
    Σ_tot(c)   = Σ_{v∈c} k_v                          groupBy(label)
    k_{v,c}    = Σ weight from v to community c       edges ⋈ labels, groupBy
    score(v,c) = k_{v,c} − k_v·(Σ_tot(c) − [c=c_v]·k_v)/m2
    c'(v)      = argmax_c score  (max_by over (score, −c))

where m2 = Σ_v k_v (both edge directions counted).  The score is the
standard ΔQ·m2 up to the constant k_v²-terms common to all candidates, so
the argmax matches the textbook greedy.  ``modularity`` mirrors the
reference's compute_modularity: Q = Σ_c [Σ_in(c)/m2 − (Σ_tot(c)/m2)²].

At 100 TB scale each sweep shuffles O(E) once (the k_{v,c} groupBy) plus
two O(V) aggregations; labels are the only moving state and the sweep
count is fixed — same plan family as label propagation.
``louvain_levels`` adds the reference's multi-level contraction: collapse
each community to a vertex (one groupBy on (c_i, c_j)) and re-run sweeps
on the coarsened graph.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.plans.iterate import iterative, loop_shuffle_width


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected weighted edge relation: both directions, weights summed
    over duplicates, self-loops dropped."""
    e = edges.select(F.col("i"), F.col("j"),
                     F.col("v").cast("double").alias("w"))
    sym = e.unionByName(
        e.select(F.col("j").alias("i"), F.col("i").alias("j"), "w")
    )
    return (
        sym.filter(F.col("i") != F.col("j"))
        .groupBy("i", "j").agg(F.sum("w").alias("w"))
    )


@iterative
def louvain_sweeps(edges: DataFrame, sweeps: int = 4,
                   materialize=None) -> DataFrame:
    """Fixed-sweep synchronous Louvain; returns (id, community).

    ``edges``: (i, j, v) — interpreted as undirected (symmetrized, weights
    summed).  Deterministic: argmax ties break to the smallest community.
    """
    sym = _symmetrize(edges).cache()
    k = sym.groupBy("i").agg(F.sum("w").alias("k")).cache()
    m2 = sym.agg(F.sum("w")).first()[0]
    labels = k.select("i", F.col("i").alias("c"))
    if materialize is None:
        materialize = lambda df: df.localCheckpoint(eager=True)  # noqa: E731

    with loop_shuffle_width(edges.sparkSession, k.count()):
        labels = _sweep_loop(sym, k, m2, labels, sweeps, materialize)
    return labels.select(F.col("i").alias("id"), F.col("c").alias("community"))


def _sweep_loop(sym, k, m2, labels, sweeps, materialize):
    for sweep in range(sweeps):
        sigma = labels.join(k, "i").groupBy("c").agg(F.sum("k").alias("sig"))
        nbr_lab = labels.select(F.col("i").alias("j"), F.col("c").alias("cn"))
        kvc = (
            sym.join(nbr_lab, "j")
            .groupBy("i", "cn").agg(F.sum("w").alias("kvc"))
        )
        cur = labels.select("i", F.col("c").alias("cv"))
        scored = (
            kvc.join(cur, "i").join(k, "i")
            .join(sigma.select(F.col("c").alias("cn"), "sig"), "cn")
            .select(
                "i", "cn",
                (F.col("kvc")
                 - F.col("k") * (F.col("sig")
                                 - F.when(F.col("cn") == F.col("cv"), F.col("k"))
                                 .otherwise(F.lit(0.0))) / F.lit(m2)
                 ).alias("score"),
            )
        )
        # parity alternation: even sweeps move even vertices, odd sweeps odd
        # ones — the standard parallel-Louvain symmetry breaker (without it,
        # two vertices that each prefer the other's community swap labels
        # forever in a 2-cycle); deterministic and oracle-replicable
        best = (
            scored.filter(F.pmod(F.col("i"), F.lit(2)) == sweep % 2)
            .groupBy("i").agg(
                F.max_by(F.col("cn"), F.struct(F.col("score"), -F.col("cn"))).alias("c")
            )
        )
        # vertices off-parity or isolated keep their label
        labels = materialize(
            labels.select("i", F.col("c").alias("_old"))
            .join(best, "i", "left_outer")
            .select("i", F.coalesce(F.col("c"), F.col("_old")).alias("c"))
        )
    return labels


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Q = Σ_c [Σ_in(c)/m2 − (Σ_tot(c)/m2)²] — the reference's
    compute_modularity on an explicit labeling (labels: (id, community))."""
    sym = _symmetrize(edges)
    m2 = sym.agg(F.sum("w")).first()[0]
    lab = labels.select(F.col("id").alias("i"), F.col("community").alias("c"))
    k = sym.groupBy("i").agg(F.sum("w").alias("k"))
    sig = lab.join(k, "i").groupBy("c").agg(F.sum("k").alias("sig"))
    inside = (
        sym.join(lab, "i")
        .join(lab.select(F.col("i").alias("j"), F.col("c").alias("cj")), "j")
        .filter(F.col("c") == F.col("cj"))
        .agg(F.sum("w")).first()[0]
    ) or 0.0
    tot = sig.agg(F.sum(F.pow(F.col("sig") / F.lit(m2), 2))).first()[0] or 0.0
    return inside / m2 - tot


@dataclass
class LouvainLevel:
    """One contraction level (mirrors the notebook's LouvainResult)."""

    labels: DataFrame      # (id, community) in ORIGINAL vertex ids
    modularity: float
    n_communities: int


@iterative
def louvain_levels(edges: DataFrame, sweeps: int = 4,
                   max_levels: int = 3) -> list[LouvainLevel]:
    """Multi-level Louvain: sweep, contract communities to vertices
    (adj' = C·A·Cᵀ as one groupBy on relabeled endpoints), repeat while the
    community count shrinks (reference louvain_levels, cell 3)."""
    spark = edges.sparkSession
    cur = edges.select("i", "j", F.col("v").cast("double").alias("v"))
    mapping = None  # original id -> current community
    levels: list[LouvainLevel] = []
    for _ in range(max_levels):
        lab = louvain_sweeps(cur, sweeps)
        if mapping is None:
            mapping = lab
        else:
            mapping = (
                mapping.select("id", F.col("community").alias("_mid"))
                .join(lab.select(F.col("id").alias("_mid"),
                                 F.col("community")), "_mid")
                .select("id", "community")
            )
        mapping = mapping.localCheckpoint(eager=True)
        q = modularity(edges, mapping)
        n_comm = mapping.select("community").distinct().count()
        levels.append(LouvainLevel(mapping, q, n_comm))
        n_vertices = cur.select(F.col("i").alias("x")).unionByName(
            cur.select(F.col("j").alias("x"))).distinct().count()
        if n_comm >= n_vertices:
            break
        relab = lab.select(F.col("id").alias("i"), F.col("community").alias("ci"))
        cur = (
            cur.join(relab, "i")
            .join(relab.select(F.col("i").alias("j"), F.col("ci").alias("cj")), "j")
            .groupBy(F.col("ci").alias("i"), F.col("cj").alias("j"))
            .agg(F.sum("v").alias("v"))
        ).localCheckpoint(eager=True)
    return levels
