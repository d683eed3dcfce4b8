"""Corpus retrieval / eval-set hygiene for training-data pipelines:
BM25 ranking and benchmark-contamination detection.

Both operators run over the ``documents`` table and stay JVM-side
(whole-stage codegen expressions; no Python in the hot path).

Scale shape (100 TB corpus):

* ``bm25_topk`` — the per-document token explode is filtered to the query
  terms BEFORE any shuffle (predicate on the exploded token, pushed inside
  the same stage as the scan), so the shuffled relation is
  O(docs_containing_query_terms × |q|), not O(total tokens).  The per-term
  document frequencies and the corpus-wide (N, avgdl) scalars are tiny
  one-row/|q|-row relations joined by broadcast.  The final top-k is a
  distributed TakeOrdered (per-partition heap + merge), never a global
  sort.
* ``contamination_check`` — the benchmark side of the n-gram join is, by
  construction, millions of times smaller than the corpus (an eval suite,
  not a crawl), so its distinct shingles broadcast; the corpus side
  aggregates hits per document immediately after the join, inside the same
  stage.  Nothing O(corpus) is ever collected or globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.pipeline.text import tokens_col


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 ranking of ``docs`` for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard "plus one"
    form, always positive.  Returns the top-``k`` documents by score with
    (doc_id, n_hit_terms, score); ties broken by doc_id ascending so the
    cut is deterministic.
    """
    terms = F.array(*[F.lit(t) for t in sorted(set(query_terms))])

    # O(matching tokens) relation: explode, keep query terms only — the
    # filter sits in the scan's stage, everything else is pruned
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .filter(F.array_contains(terms, F.col("tok")))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    # per-document length and corpus scalars (one row; broadcast).  dl is
    # an exact integer and avgdl = SUM(dl)/N on exact longs, so every
    # float input to the scoring expression is bit-identical across
    # engines and partitionings (a plain AVG would depend on
    # partial-aggregation order).
    dl = docs.select("doc_id", F.size(tokens_col()).cast("long").alias("dl"))
    corpus = dl.agg(F.count("*").cast("double").alias("n_docs"),
                    (F.sum("dl").cast("double")
                     / F.count("*").cast("double")).alias("avgdl"))
    # per-term document frequency (≤ |q| rows; broadcast)
    df_t = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(corpus))
        .join(dl, "doc_id")
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                         / (F.col("df") + 0.5)))
        .withColumn(
            "term_score",
            F.col("idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit_terms"),
             F.sum("term_score").alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "n_hit_terms", F.round("score", 6).alias("score"))
    )


def _ngrams_col(n: int):
    """Word n-grams as ' '-joined strings (array column, one per start)."""
    toks = tokens_col()
    m = F.size(toks) - (n - 1)
    return F.when(m > 0, F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
) -> DataFrame:
    """Fraction of each training document's word ``n``-grams that appear in
    the benchmark (eval-set) corpus — the standard decontamination test
    (GPT-3 used 13-grams; n is a knob, default 8).

    ``benchmark`` is a (doc_id, text) relation assumed small relative to
    ``docs`` (an eval suite): its distinct n-grams broadcast to the join.
    Returns per training doc: total distinct n-grams, how many are
    contaminated, and the fraction (0.0 for docs shorter than n tokens).
    """
    bench_grams = (
        benchmark.select(F.explode(_ngrams_col(n)).alias("gram")).distinct()
    )
    doc_grams = (
        docs.select("doc_id", F.explode(F.array_distinct(_ngrams_col(n))).alias("gram"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams).withColumn("hit", F.lit(1)),
                       "gram", "left")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_ngrams"),
             F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contaminated"))
    )
    # docs with < n tokens have zero n-grams and never reach `hits`
    return (
        docs.select("doc_id").join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(F.when(F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                           F.col("n_contaminated").cast("double") / F.col("n_ngrams"))
                    .otherwise(F.lit(0.0)), 6).alias("contamination"),
        )
    )


def contamination_check_pruned(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    buckets: int = 1 << 22,
) -> DataFrame:
    """`contamination_check` with a Bloom-style hash-bucket prefilter —
    SAME output, different physical plan, for the regime where the eval
    set itself is too large to broadcast raw (10^8 distinct 13-grams ≈
    several GB of strings): the only broadcast relation is the set of
    occupied xxhash64(gram) % ``buckets`` ids (≤ ``buckets`` longs, ~32 MB
    at the default 2^22 — a 1-hash Bloom filter with the bitmap kept as a
    distinct-id relation so the membership probe is a broadcast hash
    semi-join).  Corpus grams that miss a bucket (the overwhelming
    majority under any real contamination rate) are dropped inside the
    scan's stage; only survivors reach the exact gram semi-join, which now
    runs as an ordinary SHUFFLED semi-join on an already-tiny relation
    instead of requiring the full gram broadcast.  False bucket positives
    are removed by that exact join, so results are bit-identical to
    `contamination_check` (the DuckDB oracle is the same SQL).

    Per-document totals (``n_ngrams``) are counted BEFORE the prefilter —
    pruning affects only which grams are carried to the membership test.
    """
    bench_grams = (
        benchmark.select(F.explode(_ngrams_col(n)).alias("gram")).distinct()
    )
    bench_buckets = bench_grams.select(
        F.pmod(F.xxhash64("gram"), F.lit(buckets)).alias("_b")).distinct()
    doc_grams = (
        docs.select("doc_id", F.explode(F.array_distinct(_ngrams_col(n))).alias("gram"))
    )
    totals = doc_grams.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_ngrams"))
    survivors = (
        doc_grams.withColumn("_b", F.pmod(F.xxhash64("gram"), F.lit(buckets)))
        .join(F.broadcast(bench_buckets), "_b", "left_semi")
    )
    hits = (
        survivors.join(bench_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            # unlike the exact path, `hits` here only holds docs with >= 1
            # verified hit, so n_contaminated must coalesce in the ratio too
            F.round(F.when(F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                           F.coalesce(F.col("n_contaminated"), F.lit(0))
                           .cast("double") / F.col("n_ngrams"))
                    .otherwise(F.lit(0.0)), 6).alias("contamination"),
        )
    )
