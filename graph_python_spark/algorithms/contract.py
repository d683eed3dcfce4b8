"""Graph contraction (quotient graph) under a vertex→group mapping.

The canonical web-/code-graph coarsening step: collapse the page graph to
the host graph, the file graph to the repo graph, the vertex graph to the
community graph (what Louvain's multi-level pass does internally each
level — see ``algorithms/louvain.py``; the reference scores contraction
levels the same way in ``notebooks/Louvain.ipynb``).  Exposed here as a
standalone operator so users can coarsen with ANY mapping (nation of a
customer, repo of a file, community label) and run every downstream
algorithm on the quotient.

Plan shape (scale-first): two hash joins of the O(E) edge table against
the O(V) mapping on the vertex key — the same join every label algorithm
in this package does per round, broadcast-eligible when the mapping is
small and AQE-planned otherwise — then ONE groupBy on the (group, group)
key.  Total: one O(E) shuffle; no windows, no collect, no cartesian.
Group-key skew (every web graph has a giant host) is bounded by the
map-side partial aggregation: each task emits at most its distinct local
group-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    drop_self_loops: bool = True,
    unmapped: str = "drop",
) -> DataFrame:
    """Quotient of ``edges`` (i, j, v) under ``mapping`` (id, group).

    Returns (gi, gj, w = Σ v) — multi-edges between the same group pair
    collapse with dup_op=plus, matching ``Matrix.build``'s default
    (reference graphblas/core/matrix.py:643-698) so the quotient is again
    a well-formed weighted graph.

    ``unmapped``: 'drop' removes edges touching a vertex absent from the
    mapping (inner joins — the SQL-cleanest semantics); 'keep' retains
    such vertices as their own singleton groups, re-keyed to ``-(id+1)``.
    PRECONDITION for 'keep': real group ids must be non-negative (and
    vertex ids are, everywhere in this package) — a negative group id
    could collide with a synthetic singleton key and silently merge an
    unmapped vertex into a real group.
    """
    if unmapped not in ("drop", "keep"):
        raise ValueError(f"unmapped must be 'drop' or 'keep', got {unmapped!r}")
    how = "inner" if unmapped == "drop" else "left"
    mi = mapping.select(F.col("id").alias("i"), F.col("group").alias("_gi"))
    mj = mapping.select(F.col("id").alias("j"), F.col("group").alias("_gj"))
    g = (
        edges.join(mi, "i", how)
        .join(mj, "j", how)
        .select(
            F.coalesce("_gi", -(F.col("i") + F.lit(1))).alias("gi"),
            F.coalesce("_gj", -(F.col("j") + F.lit(1))).alias("gj"),
            F.col("v"),
        )
    )
    if drop_self_loops:
        g = g.filter(F.col("gi") != F.col("gj"))
    return g.groupBy("gi", "gj").agg(F.sum("v").alias("w"))
