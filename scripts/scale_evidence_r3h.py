"""Scale evidence for the round-3 close additions (weighted matching,
incremental triangles, effective diameter).

Usage: python scripts/scale_evidence_r3h.py [n_vertices] [op,op,...]

Same protocol as scale_evidence_r3/r3b..r3g (one local[32] session, 20g
heap, JSON lines, deterministic in-plan fixtures):

  * weighted_matching — dominant-edge greedy on the 22.9M-edge Zipf
    fixture (weights = deterministic unit hash), 6 rounds.
  * triangles_incremental — 90/10 growing-crawl split of the same
    fixture: Δ-triangles seeded by the ~10% added edges only.
  * effective_diameter — ANF read-off at q=0.9, radius 6, k=16.
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

    spark = get_spark(app="scale-evidence-r3h",
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
    print(json.dumps({"fixture_edges": edges.count(),
                      "n_vertices": n_vertices}), flush=True)

    def run_wmatch():
        from graph_python_spark.algorithms.matching import weighted_matching
        w = edges.withColumn(
            "v", (F.abs(F.xxhash64("i", "j", F.lit(7)))
                  / F.lit(9.223372036854776e18)))
        out = weighted_matching(w, rounds=6)
        stats = out.agg(F.count(F.lit(1)).alias("n"),
                        F.round(F.sum("w"), 1).alias("tw")).first()
        return {"rounds": 6, "matched_edges": int(stats["n"]),
                "total_weight": float(stats["tw"])}
    timed("weighted_matching", run_wmatch)

    def run_tri_incr():
        from graph_python_spark.algorithms.triangles import \
            triangles_incremental
        old = edges.filter((F.col("i") + F.col("j")) % 10 != 0)
        row = triangles_incremental(old, edges).first()
        return {"n_added_edges": int(row["n_added_edges"]),
                "n_new_triangles": int(row["n_new_triangles"])}
    timed("triangles_incremental", run_tri_incr)

    def run_effdiam():
        from graph_python_spark.algorithms.anf import effective_diameter
        row = effective_diameter(edges, q=0.9, radius=6, k=16).first()
        return {"q": 0.9, "radius": 6, "k": 16,
                "eff_diameter": float(row["eff_diameter"]),
                "bracket_r": int(row["r"]), "frac": float(row["frac"])}
    timed("effective_diameter", run_effdiam)

    spark.stop()


if __name__ == "__main__":
    main()
