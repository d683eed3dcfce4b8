"""Similarity search over embedding columns (array<float>).

  * ``cosine_topk``      — brute-force exact top-k: the correctness baseline.
    Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side fold — the
    element order is a deterministic left fold, so an external oracle
    summing in the same order matches bit-for-bit).
  * ``lsh_cosine_topk``  — the scale path: random-hyperplane LSH buckets
    (sign sketch) so each query only scans its bucket's candidates; recall
    traded for a ~buckets× scan reduction.  At 100 TB the bucket id is the
    shuffle/partition key and the query set is broadcast.
  * ``ivf_topk``         — IVF-style: k-means-lite centroids (deterministic
    seeded sample), route each vector to nearest centroid, probe n_probe
    cells per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Returns (query_id, neighbor_id, rank, cos_sim) with cos_sim rounded to
    1e-6 and rank ties broken by neighbor id — fully deterministic.
    """
    base = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm"
    )
    queries = (
        with_norm(emb, vec_col)
        .filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"),
                F.col("_norm").alias("_qnorm"))
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("_q"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (no RNG state —
    reproducible across engines and sessions)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_signatures(emb: DataFrame, dim: int, planes: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-sketch bucket id per vector: bit p = sign(v · h_p)."""
    sig = None
    for p in range(planes):
        hp = F.array(*[F.lit(x) for x in _hyperplane(dim, p)])
        bit = F.when(_dot(F.col(vec_col), hp) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return emb.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def lsh_cosine_topk(emb: DataFrame, query_ids: list[int], dim: int, k: int = 5,
                    planes: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The bucket equi-join replaces the cross join — at scale this is the
    difference between nnz×queries and nnz×queries/2^planes comparisons.
    """
    sig = lsh_signatures(emb, dim, planes, vec_col, id_col).cache()
    base = with_norm(sig, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm", "bucket"
    )
    queries = (
        with_norm(sig, vec_col)
        .filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"),
                F.col("_norm").alias("_qnorm"), "bucket")
    )
    scored = (
        base.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_dot(F.col("_q"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )


def cosine_near_dup(emb: DataFrame, threshold: float = 0.9,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    round(cos, 6) >= threshold — the exact baseline for near-dup removal.

    Brute-force O(n²) pairs is the CORRECTNESS oracle path; at 100 TB the
    LSH-bucketed variant (``lsh_signatures`` equi-join, same filter) bounds
    candidates per bucket — same final filter, so results agree wherever the
    bucket recall holds.
    """
    n = with_norm(emb, vec_col)
    a = n.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_a"),
                 F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_b"),
                 F.col("_norm").alias("_nb"))
    return (
        a.join(b, a["doc_a"] < b["doc_b"])
        .select("doc_a", "doc_b",
                F.round(_dot(F.col("_a"), F.col("_b")) / (F.col("_na") * F.col("_nb")), 6)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5, n_cells: int = 16,
             n_probe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-style ANN: centroids = deterministic sample (every (n/n_cells)-th
    vector by id), vectors routed to nearest centroid, queries probe the
    ``n_probe`` nearest cells."""
    ids = [r[0] for r in emb.select(id_col).orderBy(id_col).limit(n_cells * 1000).collect()]
    step = max(1, len(ids) // n_cells)
    cent_ids = ids[::step][:n_cells]
    cents = (
        emb.filter(F.col(id_col).isin(cent_ids))
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("_c"))
    )
    # route every vector to its nearest centroid (broadcast centroid join)
    routed = (
        emb.crossJoin(F.broadcast(cents))
        .select(id_col, vec_col, "cell", _dot(F.col(vec_col), F.col("_c")).alias("_aff"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_aff").desc(), F.col("cell").asc())
    assigned = routed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    base = with_norm(assigned, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm", "cell"
    )
    # queries probe their top-n_probe cells
    qprobe = (
        with_norm(emb, vec_col).filter(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(cents))
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q"),
                F.col("_norm").alias("_qnorm"), "cell",
                _dot(F.col(vec_col), F.col("_c")).alias("_aff"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_aff").desc(), F.col("cell").asc())
    qcells = qprobe.withColumn("_rn", F.row_number().over(wq)).filter(F.col("_rn") <= n_probe)
    scored = (
        base.join(F.broadcast(qcells.select("query_id", "_q", "_qnorm", "cell")), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot(F.col("_q"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm")), 6)
                .alias("cos_sim"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cos_sim")
    )
