"""Scale evidence for the second batch of round-3 session additions.

Usage: python scripts/scale_evidence_r3c.py [n_vertices] [n_vecs]

Same protocol as scale_evidence_r3/r3b (one local[32] session, 20g heap,
JSON lines, deterministic in-plan fixtures):

  * trussness_rounds — 4 h-index rounds on the 22.9M-edge Zipf fixture.
    The Zipf graph is locally tree-like (probe: 773 oriented triangles in
    22.9M edges), so the cost IS the one cached triangle enumeration; the
    per-round estimate joins ride on a 773-row relation.  The row
    evidences the static-triangle plan (enumerate once, iterate cheap) —
    the opposite cost profile from peeling, which re-enumerates per round.
  * bipartite_sides — components (12 hook rounds) + multi-source BFS
    parity (8 rounds) composed over ONE cached symmetric relation.
  * label_spread — LSH kNN graph (k=5, mutual, data-derived band bits)
    over a 200k x 32 deterministic embedding table, then 4 seeded-LPA
    sweeps clamping every 4th vector to its true label.
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
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app="scale-evidence-r3c",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    def timed(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        print(json.dumps({"op": name, "seconds": dt, "result": out}),
              flush=True)

    edges = (scale_fixture_edges(spark, n_vertices, 1)
             .select(F.col("src").alias("i"), F.col("dst").alias("j"))
             .localCheckpoint(eager=True))
    nnz = edges.count()
    print(json.dumps({"fixture_edges": nnz, "n_vertices": n_vertices,
                      "n_vecs": n_vecs}), flush=True)

    def run_trussness():
        from graph_python_spark.algorithms.ktruss import trussness_rounds
        t = trussness_rounds(edges, rounds=4)
        rows = t.count()
        return {"rounds": 4, "triangle_edges": int(rows)}
    timed("trussness", run_trussness)

    def run_bipartite():
        from graph_python_spark.algorithms.components import bipartite_sides
        out = bipartite_sides(edges, cc_rounds=12, bfs_rounds=8)
        rows = out.count()
        return {"cc_rounds": 12, "bfs_rounds": 8, "sided_vertices": int(rows)}
    timed("bipartite_sides", run_bipartite)
    edges.unpersist()

    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda d: ((F.xxhash64(F.col("id"), d) % 1000) / 500.0 - 1.0
                       ).cast("float"),
        ).alias("embedding"),
        (F.abs(F.xxhash64("id")) % 20).cast("int").alias("label"),
    ).localCheckpoint(eager=True)
    emb.count()

    def run_label_spread():
        from graph_python_spark.algorithms.labelprop import (
            seeded_label_propagation)
        from graph_python_spark.pipeline.similarity import knn_graph
        knn = knn_graph(emb, k=5, mutual=True, method="lsh", dim=32)
        e = knn.select(F.col("src").alias("i"), F.col("dst").alias("j"))
        seeds = emb.filter(F.col("vec_id") % 4 == 0).select(
            F.col("vec_id").alias("id"),
            F.col("label").cast("long").alias("label"))
        out = seeded_label_propagation(e, seeds, rounds=4)
        rows = out.count()
        return {"vecs": n_vecs, "labeled_vertices": int(rows)}
    timed("label_spread", run_label_spread)

    spark.stop()


if __name__ == "__main__":
    main()
