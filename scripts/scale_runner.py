"""Single-parallelism-level scaling probe, run in its OWN process.

Usage: python scripts/scale_runner.py <parallelism> [n_vertices] [iters]
Prints one JSON line with per-iteration times, median, and edges/sec.

Why a separate process per level (bench.py spawns this): the efficiency
comparison must give both parallelism levels an identical JVM lifecycle.
Measured on this engine: running local[8] and local[32] sequentially in one
process lets the second level inherit the first's fully JIT-compiled code
(plus a long headline phase's warmth), which skews the ratio by up to 2.5×
in either direction depending on order (observed 0.17, 0.62, 1.65 for the
same workload).  A fresh process per level — exactly how two real cluster
deployments of different sizes would run — with 2 discarded warmup
iterations gives a stable 0.90–1.06 band.  See BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parallelism = int(sys.argv[1])
    n_vertices = int(sys.argv[2]) if len(sys.argv) > 2 else 10000000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    shuffle = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

    import time

    from pyspark.sql import functions as F

    from graph_python_spark.algorithms.pagerank import iteration_times, prepare_graph
    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    loop_conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    spark = get_spark(app=f"scale-{parallelism}", parallelism=parallelism,
                      shuffle_partitions=shuffle, extra_conf=loop_conf)
    edges = scale_fixture_edges(spark, n_vertices).select(
        F.col("src").alias("i"), F.col("dst").alias("j")
    )
    t0 = time.time()
    prepared = prepare_graph(edges, partitions=shuffle)
    prep_s = round(time.time() - t0, 3)
    nnz = prepared.adj.agg(F.sum(F.size("js"))).first()[0]

    times = iteration_times(prepared, iterations=iters, warmups=2)
    med = statistics.median(times)
    print(json.dumps({
        "parallelism": parallelism,
        "shuffle_partitions": shuffle,
        "edges": nnz,
        "vertices": prepared.n,
        "prep_seconds": prep_s,
        "iterations": iters,
        "iter_times": [round(t, 2) for t in times],
        "seconds": round(sum(times), 3),
        "median_iter_sec": round(med, 3),
        "iters_per_sec": round(1.0 / med, 4),
        "edges_per_sec": round(nnz / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
