"""Scale evidence for the round-3 session-13 additions (HyperBall
harmonic, SCC condensation, IVF-PQ, shard layout).

Usage: python scripts/scale_evidence_r3f.py [n_vertices]

Same protocol as scale_evidence_r3/r3b/r3c/r3d/r3e (one local[32]
session, 20g heap, JSON lines, deterministic in-plan fixtures):

  * hyperball_harmonic — radius-4 k=16 KMV ball growth on the 22.9M-edge
    Zipf fixture: 4 SpMV-shaped shuffles total, O(V·k) state — the scale
    path exact closeness/harmonic cannot take.
  * condensation — SCC labels + quotient DAG layering on the same
    fixture; the row shows the quotient work is negligible next to SCC
    itself (the Zipf graph is one giant SCC + source tail).
  * ivf_pq_topk — 1M x 32-dim in-plan embeddings, 64 cells, 4 probes,
    PQ m=4 k=16: query-time cost is the probed-cells compressed scan
    (~1/16 of the corpus), never the float vectors.
  * shard_assign — 10M documents through the two-phase rank into
    4,096-doc shards; no global window anywhere.
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

    spark = get_spark(app="scale-evidence-r3f",
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

    edges = (scale_fixture_edges(spark, n_vertices, 1)
             .select(F.col("src").alias("i"), F.col("dst").alias("j"))
             .localCheckpoint(eager=True))
    nnz = edges.count()
    print(json.dumps({"fixture_edges": nnz, "n_vertices": n_vertices}),
          flush=True)

    def run_hyperball():
        from graph_python_spark.algorithms.anf import hyperball_harmonic
        out = hyperball_harmonic(edges, radius=4, k=16, reverse=True)
        stats = out.agg(
            F.count("*").alias("n"),
            F.round(F.sum("harmonic"), 1).alias("sum_h"),
            F.round(F.max("harmonic"), 3).alias("max_h")).first()
        out.unpersist()
        return {"radius": 4, "k": 16, "vertices_scored": int(stats["n"]),
                "sum_harmonic": float(stats["sum_h"]),
                "max_harmonic": float(stats["max_h"])}
    timed("hyperball_harmonic", run_hyperball)

    def run_condensation():
        from graph_python_spark.algorithms.scc import condensation
        out = condensation(edges, level_rounds=16)
        stats = out.agg(
            F.count("*").alias("n_sccs"),
            F.max("n_members").alias("giant"),
            F.max("level").alias("max_level")).first()
        return {"n_sccs": int(stats["n_sccs"]),
                "giant_scc": int(stats["giant"]),
                "max_level": int(stats["max_level"])}
    timed("condensation", run_condensation)

    def run_ivf_pq():
        from graph_python_spark.pipeline.similarity import ivf_pq_topk
        n, dim = 1_000_000, 32
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                (F.conv(F.substring(F.md5(F.concat_ws(
                    "_", F.col("id").cast("string"), F.lit(c))), 1, 8),
                    16, 10).cast("double") / F.lit(float(16 ** 8)) - 0.5)
                for c in range(dim)]).alias("embedding"))
        # pin the generated fixture so the index build pays corpus
        # GENERATION once, not once per Lloyd/routing stage (the md5
        # component expressions are ~10x the cost of reading a parquet
        # column — a real corpus would be a one-scan parquet read)
        emb = emb.localCheckpoint(eager=True)
        qids = list(range(16))
        out = ivf_pq_topk(emb, qids, dim=dim, k=10, m=4, codebook_k=16,
                          iterations=2, n_cells=64, n_probe=4)
        rows = out.count()
        return {"corpus": n, "dim": dim, "queries": len(qids),
                "n_cells": 64, "n_probe": 4, "result_rows": rows}
    timed("ivf_pq_topk", run_ivf_pq)

    def run_shard():
        from graph_python_spark.pipeline.packing import shard_assign
        docs = spark.range(10_000_000).select(F.col("id").alias("doc_id"))
        out = shard_assign(docs, docs_per_shard=4096, id_col="doc_id")
        stats = out.groupBy("shard").agg(F.count("*").alias("n")) \
            .agg(F.count("*").alias("shards"),
                 F.min("n").alias("min_n"), F.max("n").alias("max_n")).first()
        return {"docs": 10_000_000, "docs_per_shard": 4096,
                "shards": int(stats["shards"]),
                "min_shard": int(stats["min_n"]),
                "max_shard": int(stats["max_n"])}
    timed("shard_assign", run_shard)

    spark.stop()


if __name__ == "__main__":
    main()
