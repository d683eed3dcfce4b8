"""Deduplication operators for training-data pipelines.

Four families, all shuffle-architected for 100 TB:

  * exact        — md5 groupBy: one shuffle on a 32-byte key, min-id keeper.
  * MinHash+LSH  — shingle → k minhashes → b bands → bucket-join: candidate
                   generation never compares all pairs; the band bucket is
                   the shuffle key, and verification runs only on bucket
                   collisions (standard banding bound).
  * token Jaccard — exact all-pairs via token inverted index (token is the
                   join key); integer-only math so results are exact.
  * SimHash      — 64-bit per-doc signature via per-bit majority vote over
                   token hashes; near-dups collide on rotated prefixes.

Everything is built-in expressions (md5/xxhash64, explode, groupBy) — no
Python UDFs — so it scales with whole-stage codegen.  Hash functions are
md5-hex with string-min, chosen deliberately so DuckDB can replicate them
bit-for-bit in the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.pipeline.text import tokens_col


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical texts: (text_hash, keep_id, n_dups).

    keep_id = smallest doc_id (deterministic canonical representative).
    """
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def doc_tokens(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, tok) pairs — the shared shingle relation."""
    return (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame, k: int = 8) -> DataFrame:
    """k-permutation MinHash over whitespace tokens.

    h_i(tok) = md5('<i>:' || tok); signature_i = lexicographic min — string
    min of hex digests is a valid uniform min-hash and is reproducible in
    any engine with md5.
    """
    toks = doc_tokens(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def lsh_bands(signatures: DataFrame, k: int = 8, bands: int = 4) -> DataFrame:
    """Band digests: rows (doc_id, band, bucket). k must divide into bands."""
    rows_per_band = k // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        out.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat(*cols)).alias("bucket")))
    arr = F.array(*out)
    return (
        signatures.select("doc_id", F.explode(arr).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_lsh_pairs(docs: DataFrame, k: int = 8, bands: int = 4,
                      threshold_num: int = 1, threshold_den: int = 2) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with EXACT token
    Jaccard (integer arithmetic): keep pairs with
    jaccard >= threshold_num/threshold_den.

    Returns (doc_a, doc_b, inter, union_sz) with doc_a < doc_b.
    """
    toks = doc_tokens(docs).cache()
    sig = minhash_signatures(docs, k)
    bb = lsh_bands(sig, k, bands)
    left = bb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = bb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        cand.join(ta, "doc_a").join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a", "doc_b", "inter",
            (F.col("sza") + F.col("szb") - F.col("inter")).cast("long").alias("union_sz"),
        )
        .filter(F.col("inter") * threshold_den >= F.col("union_sz") * threshold_num)
    )
    return out


def token_jaccard_pairs(docs: DataFrame, threshold_num: int = 1,
                        threshold_den: int = 2) -> DataFrame:
    """Exact all-pairs token Jaccard via the inverted index (token join key).

    O(sum of squared posting-list lengths) — the classic exact baseline the
    LSH path approximates; integer math keeps it oracle-exact.
    """
    toks = doc_tokens(docs).cache()
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select("doc_a", "doc_b", "inter",
                (F.col("sza") + F.col("szb") - F.col("inter")).cast("long").alias("union_sz"))
        .filter(F.col("inter") * threshold_den >= F.col("union_sz") * threshold_num)
    )


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash signature: per-bit majority over xxhash64(token).

    bit_j(doc) = 1 iff sum over distinct tokens of sign(bit_j(hash(tok)))
    is positive.  Built from shiftright/bitwise-and — fully JVM-side.
    Near-duplicate detection then buckets on signature prefixes.
    """
    toks = doc_tokens(docs)
    h = F.xxhash64(F.col("tok"))
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, prefix_bits: int = 16, max_hamming: int = 8) -> DataFrame:
    """Candidate pairs sharing a simhash prefix, filtered by Hamming distance
    (bit_count is a built-in)."""
    sig = simhash(docs).cache()
    pre = sig.withColumn("prefix", F.shiftright(F.col("simhash"), 64 - prefix_bits))
    a = pre.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"), "prefix")
    b = pre.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"), "prefix")
    return (
        a.join(b, "prefix")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
