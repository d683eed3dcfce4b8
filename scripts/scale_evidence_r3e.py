"""Scale evidence for the round-3 close additions (bow-tie, SAGE sampling).

Usage: python scripts/scale_evidence_r3e.py [n_vertices]

Same protocol as scale_evidence_r3/r3b/r3c/r3d (one local[32] session,
20g heap, JSON lines, deterministic in-plan fixtures):

  * bowtie_decomposition — full Broder structure report on the 22.9M-edge
    Zipf fixture: ONE SCC run + four frontier BFS sweeps; the row records
    the region histogram so the structure (giant CORE + skew tail) is
    visible, not asserted.
  * neighbor_sample — 3-layer GraphSAGE block (fanouts 10,5,5) from 1,024
    seeds on the same fixture: per-layer cost is frontier-sized, so the
    row demonstrates the sample takes seconds regardless of E.
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

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app="scale-evidence-r3e",
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
    print(json.dumps({"fixture_edges": nnz, "n_vertices": n_vertices}),
          flush=True)

    def run_sage():
        from graph_python_spark.algorithms.walks import neighbor_sample
        seeds = spark.range(1024).select(
            (F.abs(F.xxhash64("id", F.lit(5))) % n_vertices).alias("id")
        ).distinct()
        out = neighbor_sample(edges, seeds, fanouts=[10, 5, 5])
        per_layer = {int(r["layer"]): int(r["n"])
                     for r in out.groupBy("layer")
                     .agg(F.count("*").alias("n")).collect()}
        return {"seeds": 1024, "fanouts": [10, 5, 5],
                "rows_per_layer": per_layer}
    timed("neighbor_sample", run_sage)

    def run_bowtie():
        from graph_python_spark.algorithms.bowtie import bowtie_decomposition
        out = bowtie_decomposition(edges)
        hist = {r["region"]: int(r["n"])
                for r in out.groupBy("region")
                .agg(F.count("*").alias("n")).collect()}
        out.unpersist()
        return {"regions": hist}
    timed("bowtie", run_bowtie)

    spark.stop()


if __name__ == "__main__":
    main()
