"""Synthetic source-code corpus (the north-rule input) + edge extraction.

Input shape per BASELINE.json input_hint: an Iceberg/parquet table of
source-code repositories with columns
(repo: string, path: string, commit: string, lang: string, content: string).

Generation is fully deterministic (hash-derived, seed-free per row, so any
subset of rows regenerates identically at any parallelism) and distributed
(mapInPandas over spark.range — data gen is not the query hot path).  The
``import`` lines inside ``content`` define the link graph; out-degree is
Zipf(a≈2)-skewed with explicit hub files (~1% of edges each) to exercise
the salted-repartition path.

Edge extraction is pure DataFrame ops (regexp_extract_all / explode / join
against the vertex dictionary) and NEVER mutates content — the per-row
sha256(content) invariant is test-enforced (tests/test_corpus.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), False),
])


def _stable_u32(*parts: int) -> int:
    h = hashlib.md5(":".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:4], "big")


def _out_degree(f: int, n_files: int, hub_count: int, hub_degree: int) -> int:
    if f < hub_count:
        return hub_degree
    # Zipf(a=2) via inverse CDF: deg ~ 1/u, capped
    u = (_stable_u32(f, 7) + 1) / 2**32
    deg = int(1.0 / u)
    return max(1, min(deg, 64))


def _targets(f: int, n_files: int, deg: int) -> list[int]:
    out = []
    seen = {f}
    m = 0
    while len(out) < deg and m < deg * 3:
        t = (_stable_u32(f, m, 13) * 2654435761 + m) % n_files
        m += 1
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def generate_corpus(spark: SparkSession, n_repos: int = 8, files_per_repo: int = 8,
                    hub_count: int = 3, hub_fraction: float = 0.01) -> DataFrame:
    """Deterministic corpus; n_files = n_repos * files_per_repo rows."""
    n_files = n_repos * files_per_repo
    hub_degree = max(4, int(n_files * hub_fraction))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
            for f in pdf["id"]:
                f = int(f)
                r, k = divmod(f, files_per_repo)
                repo = f"repo{r:05d}"
                path = f"src/m{k:04d}.py"
                commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
                is_md = _stable_u32(f, 3) % 20 == 0  # ~5% md rows, no imports
                if is_md:
                    lang, body = "md", [f"# notes for {repo}/{path}", "no code here"]
                else:
                    lang = "python"
                    deg = _out_degree(f, n_files, hub_count, hub_degree)
                    body = [f'"""module m{k:04d} of {repo}"""']
                    for t in _targets(f, n_files, deg):
                        tr, tk = divmod(t, files_per_repo)
                        body.append(f"import repo{tr:05d}.m{tk:04d}")
                    pad = _stable_u32(f, 5) % 5
                    body.extend(f"x_{p} = {p}  # pad" for p in range(pad))
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(commit)
                rows["lang"].append(lang)
                rows["content"].append("\n".join(body))
            yield pd.DataFrame(rows)

    return spark.range(n_files).mapInPandas(gen, CORPUS_SCHEMA)


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """Load the corpus table from an Iceberg table identifier or a parquet
    path, pruned to the input_hint columns (repo, path, commit, lang,
    content) so Iceberg/parquet column pruning drops anything else at scan.

    ``source`` resolution:
      * a path (contains ``/`` or exists on disk) -> ``spark.read.parquet``;
      * otherwise an Iceberg table identifier (``catalog.db.table``) ->
        ``spark.read.table`` — the cluster path; requires the
        iceberg-spark-runtime jar + catalog conf on the session (public
        Iceberg quickstart config), which this sandbox doesn't ship, so the
        identifier branch raises a clear error here and works unchanged on
        a provisioned cluster.
    """
    import os

    cols = [f.name for f in CORPUS_SCHEMA.fields]
    if "/" in source or os.path.exists(source):
        return spark.read.parquet(source).select(*cols)
    return spark.read.table(source).select(*cols)


def vertex_dictionary(corpus: DataFrame) -> DataFrame:
    """Dense deterministic ids: sorted (repo, path) -> id (FIXTURES.md §2).

    Two-phase global rank in pure DataFrame ops (no RDD / per-row Python,
    per the input_hint): range-repartition on (repo, path), row_number
    locally per partition in parallel, add the O(P) per-partition offsets
    (the only ordering window runs on the partition-count-sized offset
    relation, never the file list).  Done once per corpus load, never per
    iteration.
    """
    from pyspark.sql import Window

    order = [F.col("repo").asc(), F.col("path").asc()]
    rp = (
        corpus.select("repo", "path").distinct()
        .repartitionByRange(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = rp.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"))
    wloc = Window.partitionBy("_pid").orderBy(*order)
    return (
        rp.join(F.broadcast(offsets), "_pid")
        .select((F.row_number().over(wloc) + F.col("_off") - 1).alias("id"),
                "repo", "path")
    )


def extract_edges(corpus: DataFrame, vertices: DataFrame) -> DataFrame:
    """Parse import targets from content -> edges (src, dst, w).

    Pure column expressions (regexp_extract_all + explode) — content flows
    through untouched, preserving sha256(content) per row.  Duplicate links
    collapse with w = count (dup_op=plus); self-imports dropped.
    """
    imports = (
        corpus.filter(F.col("lang") == "python")
        .select(
            "repo", "path",
            F.explode(
                F.regexp_extract_all(F.col("content"), F.lit(r"import (repo\d{5}\.m\d{4})"), 1)
            ).alias("target"),
        )
        .select(
            "repo", "path",
            F.split(F.col("target"), r"\.").getItem(0).alias("t_repo"),
            F.concat(F.lit("src/"), F.split(F.col("target"), r"\.").getItem(1), F.lit(".py")).alias("t_path"),
        )
    )
    src = vertices.select(F.col("id").alias("src"), "repo", "path")
    dst = vertices.select(F.col("id").alias("dst"),
                          F.col("repo").alias("t_repo"), F.col("path").alias("t_path"))
    return (
        imports.join(src, ["repo", "path"])
        .join(dst, ["t_repo", "t_path"])
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )


def scale_fixture_edges(spark: SparkSession, n_vertices: int,
                        degree_scale: int = 1) -> DataFrame:
    """Zipf-skewed edge table generated entirely JVM-side (xxhash64 +
    explode(sequence) — no Python row path), for throughput/scaling runs
    where corpus text generation would dominate.  Same degree law as the
    corpus generator: deg ~ min(floor(1/u)+1, 64) · degree_scale, u uniform
    from a hash.  ``degree_scale`` densifies the graph at CONSTANT vertex
    count: the per-iteration O(E) parallel work (explode + partial agg)
    grows while the O(V) state/shuffle and the per-iteration fixed cost
    (job scheduling, checkpoint pin) stay put — which is what makes the
    N-vs-4N efficiency statistic reflect the engine rather than the
    fixed-cost floor on small fixtures.
    """
    v = spark.range(n_vertices)
    u = (F.abs(F.xxhash64(F.col("id"), F.lit(7))) % 1000000) / 1000000.0 + 1e-9
    deg = F.least(F.floor(F.lit(1.0) / u).cast("int") + 1, F.lit(64)) \
        * F.lit(int(degree_scale))
    return (
        v.select(F.col("id").alias("src"), F.explode(F.sequence(F.lit(1), deg)).alias("m"))
        .select("src", (F.abs(F.xxhash64(F.col("src"), F.col("m"), F.lit(13))) % n_vertices).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def content_sha256(corpus: DataFrame) -> DataFrame:
    """Per-row invariant hashes (input_hint: sha256(content) equality)."""
    return corpus.select("repo", "path", F.sha2(F.col("content"), 256).alias("sha"))
