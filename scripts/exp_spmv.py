"""Experiment: per-iteration SpMV strategy shootout for the PageRank loop.

Strategies (same arithmetic, same result):
  A edge-join  : e(i,j) cached hash(i); loop = e ⋈ w on i -> groupBy(j) sum
  B adjacency  : adj(i, js[], inv_d) cached hash(i); loop = adj ⋈ contrib on i
                 -> explode(js) -> groupBy(j) sum.  Join probes O(V) rows, the
                 O(E) work happens inline in the explode+partial-agg stage.

Usage: python scripts/exp_spmv.py <parallelism> <n_vertices> <iters>
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graph_python_spark.session import get_spark
from graph_python_spark.sources.corpus import scale_fixture_edges

LOOP_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def strategy_a(spark, edges, n, iters, P):
    e = edges.select("i", "j").distinct().repartition(P, "i").cache()
    inv_d = e.groupBy("i").agg((F.lit(0.85) / F.count("*")).alias("inv_d")).cache()
    inv_d.count()
    nnz = e.count()
    teleport = 0.15 / n
    t0 = time.time()
    contrib = None
    for k in range(iters):
        if contrib is None:
            w = inv_d.select("i", (F.lit(1.0 / n) * F.col("inv_d")).alias("w"))
        else:
            w = inv_d.join(contrib, "i", "left_outer").select(
                "i", ((F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))) * F.col("inv_d")).alias("w"))
        nc = e.join(w, "i").groupBy(F.col("j").alias("i")).agg(F.sum("w").alias("c"))
        if (k + 1) % 3 == 0 or k == iters - 1:
            nc = nc.localCheckpoint(eager=True)
        contrib = nc
    s = contrib.agg(F.sum("c")).first()[0]
    dt = time.time() - t0
    return nnz, dt, s


def strategy_b(spark, edges, n, iters, P):
    adj = (
        edges.groupBy(F.col("i"))
        .agg(F.collect_set("j").alias("js"))
        .select("i", "js", (F.lit(0.85) / F.size("js")).alias("inv_d"))
        .repartition(P, "i")
        .cache()
    )
    row = adj.agg(F.sum(F.size("js")).alias("nnz")).first()
    nnz = row["nnz"]
    teleport = 0.15 / n
    t0 = time.time()
    contrib = None
    for k in range(iters):
        if contrib is None:
            src = adj.select((F.lit(1.0 / n) * F.col("inv_d")).alias("w"), "js")
        else:
            src = adj.join(contrib, "i", "left_outer").select(
                ((F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))) * F.col("inv_d")).alias("w"), "js")
        nc = (
            src.select(F.explode("js").alias("i"), "w")
            .groupBy("i").agg(F.sum("w").alias("c"))
        )
        if (k + 1) % 3 == 0 or k == iters - 1:
            nc = nc.localCheckpoint(eager=True)
        contrib = nc
    s = contrib.agg(F.sum("c")).first()[0]
    dt = time.time() - t0
    return nnz, dt, s


def main():
    P = int(sys.argv[1]); n = int(sys.argv[2]); iters = int(sys.argv[3])
    which = sys.argv[4] if len(sys.argv) > 4 else "ab"
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app=f"exp-{P}", parallelism=P, shuffle_partitions=P,
                      extra_conf=LOOP_CONF)
    edges = scale_fixture_edges(spark, n).select(F.col("src").alias("i"), F.col("dst").alias("j"))
    out = {"P": P, "n": n, "iters": iters}
    for name, fn in (("A", strategy_a), ("B", strategy_b)):
        if name.lower() not in which:
            continue
        nnz, dt, s = fn(spark, edges, n, iters, P)
        out[name] = {"nnz": nnz, "sec": round(dt, 2),
                     "edges_per_sec": round(nnz * iters / dt, 1),
                     "checksum": s}
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
