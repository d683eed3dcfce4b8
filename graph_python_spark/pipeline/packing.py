"""Training-batch assembly operators for LLM data pipelines: sequence
packing, document chunking, deterministic dataset splits, per-document
TF-IDF keyword extraction, and int8 embedding quantization.

All five stay JVM-side (whole-stage-codegen expressions; no Python in the
hot path) and every result is a pure function of the input data — the
DuckDB oracles replay them exactly.

Scale shape (100 TB corpus):

* ``pack_sequences`` needs a GLOBAL prefix sum over a pseudo-random
  document order — the classic single-task trap.  The plan here is the
  same two-phase up/down-sweep the ``ss.scan`` kernel uses
  (operators/vector.py): documents are range-bucketed by the leading hex
  byte of their md5 order key (bucket order == order-key order, so the
  global order is bucket-major), each bucket computes its local prefix in
  a partitioned window, and the 256 bucket totals — a KB-sized relation —
  are prefix-summed and broadcast back.  No global window, no
  single-partition exchange, one narrow shuffle of (doc_id, n_tokens).
* ``chunk_documents`` is embarrassingly parallel: per-row sequence
  explode, output rows ≈ Σ ceil(n_tokens/stride) — never wider than the
  token stream itself.  Zero shuffles.
* ``dataset_split`` is a pure map-side expression on the key hash
  (the same affine-mod-prime unit hash the samplers use) — ZERO shuffles,
  reproducible across partitionings and engines, and stable under corpus
  growth (a document's split never changes when other rows are added).
* ``tfidf_topk`` shuffles the exploded-token relation once on the token
  key for document frequencies, pruning tokens above a document-frequency
  ceiling BEFORE any join (stop tokens carry no TF-IDF signal but
  dominate posting lists — the same df-cap argument as
  dedup.token_jaccard_pairs); the pruned vocab relation is still
  unbounded (the df=1 long tail survives), so it joins tf as a plain
  hash join — broadcast is left to AQE.  Per-document top-k is a window
  PARTITIONED by doc_id — parallel, never global.
* ``quantize_embeddings`` is one partitioned aggregate over the exploded
  (vec_id, component) relation — map-side partial combine keeps the
  shuffle at O(vectors), not O(vectors × dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph_python_spark.pipeline.sampling import _unit_hash
from graph_python_spark.pipeline.text import tokens_col


def pack_sequences(docs: DataFrame, budget: int, text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing: order documents pseudo-randomly
    (md5 of doc_id — engine-replayable), concatenate their token streams,
    and cut the stream every ``budget`` tokens (the standard GPT-style
    pre-training packing; documents crossing a boundary are split across
    consecutive bins).

    Returns one row per non-empty document:
      (doc_id, n_tokens, start_offset, bin_start, bin_end, crosses)
    where start_offset is the document's exclusive global token offset,
    bin_* = offset // budget of its first/last token, and crosses = 1
    when the document straddles a bin boundary.

    Plan: two-phase distributed prefix sum (see module docstring) — the
    bucket key is the first hex byte of the md5 order key, so bucket
    ranges partition the global order and local prefixes compose exactly.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    base = (
        docs.select(
            "doc_id",
            F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("_h", F.md5(F.col("doc_id").cast("string")))
        .withColumn("_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("long"))
    )
    w_local = (
        Window.partitionBy("_b")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_cum", F.sum("n_tokens").over(w_local))
    totals = local.groupBy("_b").agg(F.sum("n_tokens").alias("_tot"))
    # 256 rows — the only ordered window runs on this KB-sized relation
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    start = (F.col("_off") + F.col("_cum") - F.col("n_tokens")).alias("start_offset")
    out = (
        local.join(F.broadcast(offsets), "_b")
        .select("doc_id", "n_tokens", start)
        .withColumn("bin_start", F.floor(F.col("start_offset") / budget))
        .withColumn(
            "bin_end",
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / budget),
        )
        .withColumn(
            "crosses",
            (F.col("bin_end") > F.col("bin_start")).cast("long"),
        )
    )
    return out


def chunk_documents(
    docs: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into overlapping fixed-size
    chunks (the retrieval / context-window preprocessing step): chunk k
    covers tokens [k·stride, k·stride + chunk_size) with
    stride = chunk_size − overlap; the last chunk is clipped to the
    document end.  A document with ≤ chunk_size tokens yields exactly one
    chunk.  Empty documents yield none.

    Returns (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_md5)
    where chunk_md5 fingerprints the space-joined token slice — the
    downstream chunk-level dedup key.

    Pure per-row explode: zero shuffles, output bounded by the token
    stream size.
    """
    if chunk_size <= 0 or overlap < 0 or overlap >= chunk_size:
        raise ValueError("need chunk_size > overlap >= 0")
    stride = chunk_size - overlap
    toks = tokens_col(text_col)
    n = F.size(toks).cast("long")
    # chunks beyond the first cover the (n - chunk_size) tail in strides
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_size, F.lit(0)) + stride - 1) / stride
    )
    base = docs.select(
        "doc_id", toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_k")
    ).filter(F.col("_n") > 0)
    start = (F.col("chunk_id") * stride).alias("start_tok")
    out = (
        base.select(
            "doc_id",
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_id"),
        )
        .select("doc_id", "chunk_id", "_toks", "_n", start)
        .withColumn(
            "n_chunk_tokens",
            F.least(F.col("start_tok") + chunk_size, F.col("_n")) - F.col("start_tok"),
        )
        .withColumn(
            "chunk_md5",
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("_toks"),
                        (F.col("start_tok") + 1).cast("int"),
                        F.col("n_chunk_tokens").cast("int"),
                    ),
                    " ",
                )
            ),
        )
        .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens", "chunk_md5")
    )
    return out


def dataset_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    salt: int = 47,
) -> DataFrame:
    """Deterministic train/valid/test assignment: u = unit_hash(key) ∈
    (0, 1]; u ≤ train → 'train', u ≤ train+valid → 'valid', else 'test'.

    A row's split is a pure function of its key — stable under corpus
    growth, re-partitioning, and engine (the oracle replays the same
    affine-mod-prime hash).  Zero shuffles: the expression is map-side.

    ``key_col`` must be integral: the affine hash on a non-numeric key
    would coerce to NULL and silently dump every row into 'test', so
    that is rejected here (hash string keys to a long first, e.g.
    ``F.xxhash64``, accepting that an external replayer must do the
    same).
    """
    dtypes = dict(docs.dtypes)
    if dtypes.get(key_col) not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"dataset_split needs an integral key column; {key_col!r} is "
            f"{dtypes.get(key_col)!r}")
    u = _unit_hash(key_col, salt)
    return docs.select(
        key_col,
        F.when(u <= train_frac, F.lit("train"))
        .when(u <= train_frac + valid_frac, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    max_df_frac: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords: score = tf · ln(N/df),
    tokens appearing in more than ``max_df_frac`` of documents pruned
    (stop tokens carry no signal and dominate posting lists — the df-cap
    that keeps the token shuffle bounded at corpus scale).

    Returns (doc_id, tok, tf, score, rank), rank 1..k by (score desc,
    tok asc) — the tie-break makes the cut a pure function of the data.
    """
    n_docs = docs.select(F.count("*").cast("double").alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # prune the O(vocab) df relation BEFORE it joins anything — only the
    # 1-row n_docs scalar is force-broadcast; the (still unbounded) pruned
    # vocab joins tf as a plain hash join, broadcast only if AQE sees fit
    df_t = (
        tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
        .join(F.broadcast(n_docs))
        .filter(F.col("df") <= F.lit(max_df_frac) * F.col("n_docs"))
    )
    scored = tf.join(df_t, "tok").withColumn(
        "_score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    w = Window.partitionBy("doc_id").orderBy(F.col("_score").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "tok",
            "tf",
            F.round("_score", 6).alias("score"),
            "rank",
        )
    )


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 scalar quantization of each embedding vector:
    scale = max|x| / 127, code_i = floor(x_i/max|x|·127 + 0.5) ∈
    [−127, 127], plus the reconstruction MSE — the storage/IO shape an
    ANN index build wants (4 bytes → 1 byte per component), with the
    quality loss measured per vector.

    Returns (vec_id, n_dims, sum_codes, max_abs, mse).  All-zero vectors
    quantize to all-zero codes with mse 0 (guarded — no 0/0).

    ONE shuffle of the exploded components on vec_id: the per-vector max
    runs as a window over that partitioning and the final groupBy reuses
    the same hash partitioning (no second exchange).
    """
    ex = emb.select(
        "vec_id", F.explode(F.col(vec_col)).alias("_xf")
    ).withColumn("x", F.col("_xf").cast("double"))
    w = Window.partitionBy("vec_id")
    withmax = ex.withColumn("_mx", F.max(F.abs(F.col("x"))).over(w))
    code = (
        F.when(
            F.col("_mx") > 0,
            F.floor(F.col("x") / F.col("_mx") * 127.0 + 0.5),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    staged = withmax.withColumn("_code", code)
    recon = F.col("_code").cast("double") * F.col("_mx") / 127.0
    sqerr = (F.col("x") - recon) * (F.col("x") - recon)
    return staged.groupBy("vec_id").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.sum("_code").cast("long").alias("sum_codes"),
        F.round(F.max("_mx"), 6).alias("max_abs"),
        F.round(F.sum(sqerr) / F.count("*"), 6).alias("mse"),
    )


def pipeline_pack_e2e(
    docs: DataFrame,
    budget: int,
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    salt: int = 47,
) -> DataFrame:
    """The end-to-end pre-training batch-assembly recipe, composed from
    this package's stages: Gopher-style quality gate → exact dedup
    (canonical min-doc_id representative per byte-identical text) →
    deterministic hash split → sequence-pack the TRAIN split.

    Returns the packed train-split documents with the
    ``pack_sequences`` schema.  Every stage is a pure function of the
    corpus, so the whole DAG replays exactly in SQL (the oracle composes
    the same four stages).

    Plan: each stage is the already-audited plan of its operator; the
    composition adds two semi-joins on doc_id (quality survivors,
    dedup winners) — both partitioned hash joins, no new shuffle class.
    """
    from graph_python_spark.pipeline.text import quality_filter

    kept = quality_filter(docs).filter(F.col("keep")).select("doc_id")
    survivors = docs.join(kept, "doc_id", "left_semi")
    winners = (
        survivors.groupBy(F.md5(F.col("text")).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    canon = survivors.join(winners, "doc_id", "left_semi")
    train = canon.join(
        dataset_split(canon, train_frac=train_frac, valid_frac=valid_frac,
                      salt=salt).filter(F.col("split") == "train")
        .select("doc_id"),
        "doc_id", "left_semi")
    return pack_sequences(train, budget)


def chunk_dedup_ratio(
    docs: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Sub-document duplication report: chunk every document
    (``chunk_documents``), find chunks whose md5 appears under MORE THAN
    ONE document, and return each document's duplicated-chunk ratio —
    the fine-grained dedup signal that doc-level exact/near dedup misses
    (boilerplate headers, license blocks, quoted passages).

    Returns (doc_id, n_chunks, n_dup_chunks, dup_ratio), one row per
    non-empty document.

    Plan: the chunk relation groups once on the md5 key (map-side
    combine), duplicated digests semi-join back, then one per-doc
    aggregate — all hash-partitioned, nothing global.
    """
    chunks = chunk_documents(docs, chunk_size, overlap, text_col)
    dup_digests = (
        chunks.groupBy("chunk_md5")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("chunk_md5")
    )
    flagged = chunks.join(dup_digests, "chunk_md5", "left_semi") \
        .groupBy("doc_id").agg(F.count("*").cast("long").alias("n_dup_chunks"))
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_chunks"))
    return per_doc.join(flagged, "doc_id", "left_outer").select(
        "doc_id", "n_chunks",
        F.coalesce(F.col("n_dup_chunks"), F.lit(0)).cast("long")
        .alias("n_dup_chunks"),
        F.round(F.coalesce(F.col("n_dup_chunks"), F.lit(0)).cast("double")
                / F.col("n_chunks").cast("double"), 6).alias("dup_ratio"),
    )


def shard_assign(docs: DataFrame, docs_per_shard: int,
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic pre-training shard layout: globally shuffle the
    corpus by md5(id) — the engine-replayable pseudo-random order every
    packing op here uses — and cut the shuffled sequence into shards of
    exactly ``docs_per_shard`` consecutive documents (the last shard is
    ragged).  This is the "shuffle then shard" step a training job runs
    once so that every fixed-size shard is an unbiased sample of the
    corpus and any prefix of shards is too (curriculum-safe resharding).

    Returns (doc_id, shard, pos_in_shard): shard = global_rank //
    docs_per_shard, pos_in_shard = global_rank % docs_per_shard, where
    global_rank is the document's 0-based position in md5 order.

    Plan: the same two-phase distributed rank as ``pack_sequences`` — a
    per-bucket partitioned window (bucket = leading md5 hex byte, so
    bucket-major order IS the global order) plus one 256-row offsets
    relation broadcast back.  No global window, one narrow shuffle of
    (id, hash) pairs — holds at any corpus size.
    """
    if docs_per_shard <= 0:
        raise ValueError("docs_per_shard must be positive")
    base = (
        docs.select(id_col)
        .withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .withColumn("_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("long"))
    )
    w_local = Window.partitionBy("_b").orderBy("_h", id_col)
    local = base.withColumn("_rn", F.row_number().over(w_local).cast("long"))
    totals = local.groupBy("_b").agg(F.count(F.lit(1)).alias("_tot"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"))
    rank = (F.col("_off") + F.col("_rn") - 1)
    return (
        local.join(F.broadcast(offsets), "_b")
        .select(
            id_col,
            F.floor(rank / docs_per_shard).cast("long").alias("shard"),
            (rank % docs_per_shard).cast("long").alias("pos_in_shard"))
    )
