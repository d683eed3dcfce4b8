"""Session-level scale evidence for the round-3 target operators.

Usage: python scripts/scale_evidence_r3.py [n_vertices] [n_docs]

Runs the five operators VERDICT round 2 asked for 22.9M-edge evidence on
(`pagerank_incremental`, `cc_incremental`, `maximal_matching`,
`pipeline_pack_e2e`, `pca_top_component`) at the same fixture scale the
session-3..9 BASELINE.md rows used: the deterministic Zipf edge fixture at
4M vertices (~22.9M edges), a 10M-row synthetic document corpus generated
entirely JVM-side, and a 4M x 32 deterministic embedding table.  One
local[32] session, 20g heap, timings printed as JSON lines; results are
recorded as BASELINE.md rows ("/tmp scale-evidence protocol", now a
committed script).

The incremental pair runs against an HONEST snapshot split: the old graph
is the ~90% of edges with (i+j) % 10 != 0 (edges only added between
snapshots, the growing-crawl precondition of cc_incremental), with the
warm-start state computed on the old graph INSIDE the timed region of its
own row — the point of the row is the cost of the full incremental
recompute a crawl-to-crawl pipeline pays.
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
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app="scale-evidence-r3",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    edges = (scale_fixture_edges(spark, n_vertices, 1)
             .select(F.col("src").alias("i"), F.col("dst").alias("j"))
             .localCheckpoint(eager=True))
    nnz = edges.count()
    old = edges.filter((F.col("i") + F.col("j")) % 10 != 0)
    n_old = old.count()
    print(json.dumps({"fixture_edges": nnz, "old_snapshot_edges": n_old,
                      "n_vertices": n_vertices}), flush=True)

    def timed(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        print(json.dumps({"op": name, "seconds": dt, "result": out}),
              flush=True)

    # --- pagerank_incremental: converge-ish on old, 5 warm iterations on
    # full.  Both phases timed (the recompute a crawl pipeline pays).
    def run_pr_incr():
        from graph_python_spark.algorithms.pagerank import (
            pagerank_fixed, pagerank_incremental)
        t0 = time.time()
        init = pagerank_fixed(old, iterations=5)
        init.localCheckpoint(eager=True)
        warm_s = round(time.time() - t0, 1)
        scores = pagerank_incremental(edges, init, iterations=5)
        total = scores.agg(F.sum("score")).first()[0]
        return {"old_graph_5_iters_sec": warm_s,
                "score_sum": round(float(total), 3)}
    timed("pagerank_incr", run_pr_incr)

    # --- cc_incremental: labels on old subgraph, 4 hook rounds on full.
    def run_cc_incr():
        from graph_python_spark.algorithms.components import (
            cc_fixed_rounds, cc_incremental)
        t0 = time.time()
        init = cc_fixed_rounds(old, rounds=6).localCheckpoint(eager=True)
        warm_s = round(time.time() - t0, 1)
        labels = cc_incremental(edges, init, rounds=4)
        n_comp = labels.agg(F.countDistinct("component")).first()[0]
        return {"old_graph_6_rounds_sec": warm_s, "components": int(n_comp)}
    timed("cc_incr", run_cc_incr)

    # --- maximal matching + the residual check ADVICE asked to expose.
    def run_matching():
        from graph_python_spark.algorithms.matching import (
            maximal_matching, residual_alive_edges)
        matched = maximal_matching(edges, rounds=4)
        n_m = matched.count()
        resid = residual_alive_edges(edges, matched).count()
        return {"matched_edges": int(n_m), "residual_alive": int(resid)}
    timed("matching", run_matching)

    # --- PCA power iteration over a 4M x 32 deterministic embedding table.
    def run_pca():
        from graph_python_spark.pipeline.features import pca_top_component
        emb = spark.range(n_vertices).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda d: ((F.xxhash64(F.col("id"), d) % 1000) / 500.0 - 1.0
                           ).cast("float"),
            ).alias("embedding"),
        )
        comp = pca_top_component(emb, iterations=3)
        rows = comp.count()
        return {"component_rows": int(rows), "dims": 32}
    timed("pca_power", run_pca)

    # --- end-to-end pack over a 10M-doc synthetic corpus (text generated
    # JVM-side: hash-indexed vocabulary, 8..40 words so the quality gate
    # actually drops the short tail).
    def run_pack():
        vocab = ["the", "of", "data", "spark", "graph", "table", "join",
                 "scan", "rank", "edge", "node", "batch", "query", "hash",
                 "sort", "agg", "row", "column", "shuffle", "stream"]
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), (F.abs(F.xxhash64("id")) % 33) + 8),
                    lambda w: F.element_at(
                        F.array(*[F.lit(v) for v in vocab]),
                        (F.abs(F.xxhash64(F.col("id"), w)) % 20 + 1
                         ).cast("int")),
                ),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 8).cast("string")
                     ).alias("source"),
        ).withColumn("n_chars", F.length("text"))
        from graph_python_spark.pipeline.packing import pipeline_pack_e2e
        packed = pipeline_pack_e2e(docs, budget=512)
        n_seq = packed.agg(F.countDistinct("bin_start")).first()[0]
        n_rows = packed.count()
        return {"docs": n_docs, "packed_rows": int(n_rows),
                "sequences": int(n_seq)}
    timed("pipeline_pack", run_pack)

    spark.stop()


if __name__ == "__main__":
    main()
