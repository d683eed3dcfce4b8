"""Triangle counting — masked plus_pair SpGEMM, edge-based plan.

Reference ingredients (SURVEY.md §2.8): plus_pair semiring
(``graphblas/core/operator/semiring.py:181``), tril/triu select
(``core/operator/indexunary.py:105``), masked mxm — count =
reduce(plus) of C(L.S) = L·Lᵀ with L the strictly-upper triangle.

Spark plan: never materialize A·A.  Canonicalize to i<j edges, then a
3-way self-join closes wedges a<b<c with the (a,c) edge — i.e. the mask is
pushed INTO the join (same effect as C(L.S)).  Two shuffles total; the
ordering constraint a<b<c counts each triangle exactly once and keeps the
join sides skew-bounded (hub vertices only expand on their higher-id side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple graph as a<b edges (tril/triu canonicalization)."""
    return (
        edges.select(
            F.least(F.col("i"), F.col("j")).alias("a"),
            F.greatest(F.col("i"), F.col("j")).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))  # drop self-loops
        .distinct()
    )


def triangle_count(edges: DataFrame) -> int:
    return triangles_df(edges).agg(F.count("*").alias("n")).first()["n"]


def triangles_df(edges: DataFrame) -> DataFrame:
    """One row (a, b, c) per triangle, a<b<c."""
    ue = canonical_edges(edges).cache()
    e1 = ue.select(F.col("a"), F.col("b"))
    e2 = ue.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = ue.select(F.col("a"), F.col("b").alias("c"))
    # wedge a<b<c via (a,b),(b,c); close with (a,c)  == mask semi-join on L
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """Vector of per-vertex triangle counts (LAGraph tricount variant)."""
    t = triangles_df(edges)
    stacked = (
        t.select(F.col("a").alias("id"))
        .unionAll(t.select(F.col("b").alias("id")))
        .unionAll(t.select(F.col("c").alias("id")))
    )
    return stacked.groupBy("id").agg(F.count("*").alias("triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: 2·t(v) / (d(v)·(d(v)-1)),
    over the undirected simple graph (self-loops and duplicates dropped);
    0.0 for degree < 2.  Returns (id, degree, triangles, coeff).

    GraphBLAS recipe (same ingredients as LAGraph's tricount-based
    variant): t = per-vertex reduce of the masked plus_pair SpGEMM,
    d = reduce_rowwise of one(A) — both single-pass aggregates here, with
    the triangle join's a < b < c orientation bounding hub-side skew.
    """
    ue = canonical_edges(edges).cache()
    deg = (
        ue.select(F.col("a").alias("id"))
        .unionAll(ue.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    tri = triangles_per_vertex(ue.select(F.col("a").alias("i"),
                                         F.col("b").alias("j")))
    d = F.col("degree")
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return (
        deg.join(tri, "id", "left_outer")
        .select(
            "id",
            d.alias("degree"),
            t.alias("triangles"),
            F.when(d >= 2, 2.0 * t / (d * (d - 1)))
            .otherwise(F.lit(0.0))
            .alias("coeff"),
        )
    )
