"""Scale evidence for the round-3 close additions, batch 3 (NMI,
Spearman, spectral gap).

Usage: python scripts/scale_evidence_r3i.py [n_vertices] [op,op,...]

Same protocol as scale_evidence_r3/r3b..r3h (one local[32] session, 20g
heap, JSON lines, deterministic in-plan fixtures):

  * nmi — 10M-id pair of synthetic labelings (1,000 × 900 label
    alphabets): contingency-bounded exchanges only.
  * spearman — 10M-id pair of hash-score vectors through the two-phase
    rank (no global window).
  * spectral_gap — 6 deflated power steps on the 22.9M-edge Zipf
    fixture (the PageRank SpMV plan + two 1-row folds per step).
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

    spark = get_spark(app="scale-evidence-r3i",
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

    def run_nmi():
        from graph_python_spark.algorithms.metrics import \
            normalized_mutual_information
        ids = spark.range(10_000_000)
        a = ids.select(F.col("id"), (F.col("id") % 1000).alias("label"))
        b = ids.select(F.col("id"),
                       ((F.col("id") / 7).cast("long") % 900).alias("label"))
        row = normalized_mutual_information(a, b).first()
        return {"ids": 10_000_000, "nmi": float(row["nmi"]),
                "mi": float(row["mi"])}
    timed("nmi", run_nmi)

    def run_spearman():
        from graph_python_spark.algorithms.metrics import spearman_correlation
        ids = spark.range(2_000_000)
        a = ids.select(
            "id", (F.abs(F.xxhash64("id", F.lit(1))).cast("double"))
            .alias("score"))
        b = ids.select(
            "id", (F.abs(F.xxhash64("id", F.lit(2))).cast("double")
                   + F.col("id").cast("double") * 1e12).alias("score"))
        row = spearman_correlation(a, b).first()
        return {"ids": 2_000_000, "sum_d2": int(row["sum_d2"]),
                "spearman": float(row["spearman"])}
    timed("spearman", run_spearman)

    def run_s_core():
        from graph_python_spark.algorithms.kcore import s_core
        edges = (scale_fixture_edges(spark, n_vertices, 1)
                 .select(F.col("src").alias("i"), F.col("dst").alias("j"))
                 .withColumn("v", (F.abs(F.xxhash64("i", "j", F.lit(3)))
                                   / F.lit(9.223372036854776e18)) * 2.0)
                 .localCheckpoint(eager=True))
        out = s_core(edges, s=4.0)
        stats = out.agg(F.count(F.lit(1)).alias("n"),
                        F.round(F.min("wdeg"), 3).alias("minw")).first()
        return {"s": 4.0, "surviving_vertices": int(stats["n"] or 0),
                "min_wdeg": float(stats["minw"]) if stats["minw"] is not None
                else None}
    timed("s_core", run_s_core)

    def run_spectral():
        from graph_python_spark.algorithms.spectral import spectral_gap
        edges = (scale_fixture_edges(spark, n_vertices, 1)
                 .select(F.col("src").alias("i"), F.col("dst").alias("j"))
                 .localCheckpoint(eager=True))
        n = edges.count()
        row = spectral_gap(edges, iterations=6).first()
        return {"edges": n, "iterations": 6,
                "lambda2_abs": float(row["lambda2_abs"]),
                "spectral_gap": float(row["spectral_gap"])}
    timed("spectral_gap", run_spectral)

    spark.stop()


if __name__ == "__main__":
    main()
