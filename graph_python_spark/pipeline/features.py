"""Embedding feature operators for training-data pipelines: GNN-style
neighbor aggregation (feature propagation / smoothing) and L2
normalization.

The relational form of "average your neighbors' embeddings" is the
scalable one: posexplode the vectors to (id, pos, val) rows — a pure JVM
generator inside whole-stage codegen — route them along the edge relation,
and ⊕-aggregate per (dst, pos).  That is exactly one O(E·dim) shuffle with
map-side combine, the same plan class as the engine's SpMV; no Python
touches a row, and no per-vertex array ever exceeds a cell (contrast a
collect_list-of-arrays plan, which would build degree-sized rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_mean_embeddings(
    edges: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean of in-neighbor embeddings per vertex, exploded form:
    (id, pos, mean_val, n_nbrs) — one row per (destination, dimension).

    ``edges``: (src, dst) long columns; a vertex's output averages the
    embeddings of its in-neighbors {src : (src, dst) ∈ E} (multi-edges
    should be deduped by the caller if unweighted semantics are wanted).
    ``pos`` is 0-based.  Callers wanting the array form can
    ``groupBy(id).agg(array_sort(collect_list(struct(pos, mean_val))))`` —
    bounded by dim, not by degree.
    """
    ex = emb.select(
        F.col(id_col).alias("src"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    return (
        edges.select("src", "dst")
        .join(ex, "src")
        .groupBy(F.col("dst").alias("id"), "pos")
        .agg(
            F.avg(F.col("val").cast("double")).alias("mean_val"),
            F.count("*").cast("long").alias("n_nbrs"),
        )
    )


def l2_normalize(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace ``vec_col`` with its L2-normalized version (zero vectors
    pass through unchanged — no NaNs, the similarity-path convention)."""
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    normed = F.when(
        norm > 0,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm),
    ).otherwise(F.transform(F.col(vec_col), lambda x: x.cast("double")))
    return emb.withColumn(vec_col, normed)
