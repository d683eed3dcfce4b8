"""Scale evidence for the round-3 session-14 additions (balanced LPA
partitioning, densest subgraph, heavy hitters, BPE apply, logreg
classifier).

Usage: python scripts/scale_evidence_r3g.py [n_vertices] [op,op,...]

Same protocol as scale_evidence_r3/r3b..r3f (one local[32] session, 20g
heap, JSON lines, deterministic in-plan fixtures):

  * partition_assign — k=32 balanced LPA over the 22.9M-edge Zipf
    fixture, 4 rounds + quality report; the row records the cut fraction
    and the max/min part sizes (the quota keeps them within the 5%
    slack).
  * densest_subgraph — greedy peel on the same fixture, 12 rounds.
  * heavy_hitters — 10M-doc synthetic Zipf corpus (~120M tokens),
    capacity 4096: exchanges stay heavy-hitter-sized.
  * bpe_encode — train 12 merges on 1M docs and apply them corpus-wide.
  * logreg_classifier — 1M docs, dim 64, 3 GD steps over hashed
    features (~12M (doc, feature) rows per aggregation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app="scale-evidence-r3g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    def timed(name, fn):
        if only is not None and name not in only:
            return
        sc.setJobGroup(name, name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        print(json.dumps({"op": name, "seconds": dt, "result": out}),
              flush=True)

    need_edges = only is None or only & {"partition_assign",
                                         "densest_subgraph"}
    edges = None
    if need_edges:
        edges = (scale_fixture_edges(spark, n_vertices, 1)
                 .select(F.col("src").alias("i"), F.col("dst").alias("j"))
                 .localCheckpoint(eager=True))
        print(json.dumps({"fixture_edges": edges.count(),
                          "n_vertices": n_vertices}), flush=True)

    def zipf_docs(n_docs, words_per_doc=12, vocab=50_000):
        # Zipf-ish token ids via squared unit hash, rendered as words
        d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        word = (
            "concat('w', CAST(CAST(pow(abs(xxhash64(doc_id, x)) "
            f"/ 9.223372036854776e18, 2.0) * {vocab} AS BIGINT) AS STRING))")
        return d.select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(1, "
                f"{words_per_doc}), x -> {word}), ' ')").alias("text"))

    def run_partition():
        from graph_python_spark.algorithms.partition import (
            partition_assign, partition_quality)
        assign = partition_assign(edges, k=32, rounds=4)
        q = partition_quality(edges, assign)
        stats = q.agg(
            F.count(F.lit(1)).alias("parts"),
            F.min("n_vertices").alias("min_v"),
            F.max("n_vertices").alias("max_v"),
            F.sum("internal_edges").alias("internal"),
            (F.sum("cut_edges") / 2).cast("long").alias("crossing")).first()
        assign.unpersist()
        return {"k": 32, "rounds": 4, "parts": int(stats["parts"]),
                "min_part": int(stats["min_v"]),
                "max_part": int(stats["max_v"]),
                "internal_edges": int(stats["internal"]),
                "crossing_edges": int(stats["crossing"])}
    timed("partition_assign", run_partition)

    def run_densest():
        from graph_python_spark.algorithms.densest import densest_subgraph
        summary, members = densest_subgraph(edges, max_rounds=12)
        rows = [tuple(r) for r in summary.orderBy("round").collect()]
        best = [r for r in rows if r[4] == 1][0]
        members.unpersist()
        return {"rounds_run": len(rows), "best_round": int(best[0]),
                "best_vertices": int(best[1]), "best_density": best[3]}
    timed("densest_subgraph", run_densest)

    def run_hh():
        from graph_python_spark.pipeline.sketches import heavy_hitters
        docs = zipf_docs(10_000_000)
        out = heavy_hitters(docs, k=50, capacity=4096)
        rows = out.collect()
        return {"docs": 10_000_000, "capacity": 4096,
                "reported": len(rows),
                "top": [rows[0]["token"], int(rows[0]["n"])] if rows else None}
    timed("heavy_hitters", run_hh)

    def run_bpe():
        from graph_python_spark.pipeline.text import bpe_encode
        docs = zipf_docs(1_000_000).localCheckpoint(eager=True)
        out = bpe_encode(docs, merges=12)
        stats = out.agg(F.count(F.lit(1)).alias("docs"),
                        F.sum("n_tokens").alias("toks"),
                        F.sum("n_bpe").alias("bpe")).first()
        return {"docs": int(stats["docs"]), "tokens": int(stats["toks"]),
                "bpe_symbols": int(stats["bpe"])}
    timed("bpe_encode", run_bpe)

    def run_logreg():
        from graph_python_spark.pipeline.features import logreg_classifier
        docs = (zipf_docs(1_000_000)
                .select("doc_id", "text",
                        (F.col("doc_id") % 2).alias("label"))
                .localCheckpoint(eager=True))
        w = logreg_classifier(docs, dim=64, steps=3)
        return {"docs": 1_000_000, "dim": 64, "steps": 3,
                "w_norm": round(sum(v * v for v in w) ** 0.5, 6)}
    timed("logreg_classifier", run_logreg)

    spark.stop()


if __name__ == "__main__":
    main()
